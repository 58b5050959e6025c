"""Multimodal pipeline queries.

Oracle-checkable even though the decode path is numpy inside mapInPandas:
the FAKEMEDIA corpus is closed-form in (media_id, offset) (see
ducktales_spark.multimodal.synth_media) and features are exact-integer-sum
math, so the DuckDB oracle re-derives every payload byte and feature value
from the spec by SQL — no literal fixtures, valid at any SF. The pytest
suite additionally asserts exact values (tests/test_multimodal.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ducktales_spark.data import table
from ducktales_spark.multimodal import (
    audio_features,
    image_features,
    sample_frames,
    synth_media,
)
from ducktales_spark.registry import register


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    return synth_media(table(spark, sf_dir, "documents"), "doc_id")


def _media_kind(spark: SparkSession, sf_dir: str, rem: int) -> DataFrame:
    """One modality's slice of the synthetic corpus, filtered BEFORE the
    generator: synth_media assigns kind = id % 3 (0 image / 1 audio /
    2 video), so filtering the id column at the parquet scan (a pushed
    predicate) keeps the generator from synthesizing — and shipping
    through Arrow — the two modalities the branch then drops. m02's three
    branches each ran the full-corpus generator and discarded 2/3 of its
    Python-boundary traffic. r15 interleaved A/B (sf0.1, min-of-7,
    value-parity true): m02 1.625 -> 0.587 s total for this plus the two
    multimodal.py fixes (kernel-side kind filter/column prune and the
    shuffle-partition-sized generator — the task-floor cut is the larger
    local share; this pre-filter is what scales, since real corpora pay
    per-byte, not per-task).

    pmod, not %: synth_media assigns kind with Python's non-negative
    ``mid % 3``, while Spark's ``%`` is sign-preserving — under ``%`` a
    negative doc_id would match NO branch and silently vanish from m02
    even though the generator classifies it as a real modality. pmod
    matches the generator's modulo for every id (r16 ADVICE fix; identical
    results on the non-negative driver corpus, oracle-verified)."""
    docs = table(spark, sf_dir, "documents").filter(
        F.pmod(F.col("doc_id"), F.lit(3)) == rem
    )
    return synth_media(docs, "doc_id")


@register(
    "m01_media_catalog",
    survey_ids=(),
    # payload byte sizes are closed-form in media_id: FIMG = 16-byte header +
    # w*h*3, FAUD = 12 + 2*n_samples, FVID = 20 + nf*16*12*3
    oracle="""
    WITH m AS (
      SELECT CASE doc_id % 3 WHEN 0 THEN 'image'
                             WHEN 1 THEN 'audio'
                             ELSE 'video' END AS kind,
             CASE doc_id % 3
               WHEN 0 THEN 16 + (32 + doc_id % 32) * (24 + doc_id % 24) * 3
               WHEN 1 THEN 12 + 2 * (1600 + doc_id % 800)
               ELSE 20 + (4 + doc_id % 5) * 16 * 12 * 3 END AS nbytes
      FROM documents
    )
    SELECT kind, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(nbytes) AS BIGINT) AS total_bytes
    FROM m GROUP BY kind ORDER BY kind
    """,
)
def m01_media_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media corpus catalog: typed metadata stays queryable without
    touching payload bytes (meta-only projection)."""
    return (
        _media(spark, sf_dir)
        .groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.length("data")).alias("total_bytes"),
        )
        .orderBy("kind")
    )


_M02_ORACLE = """
    WITH docs AS (SELECT doc_id AS mid FROM documents),
    img_px AS (
      SELECT mid, w, h,
             (mid * 31 + 7 * unnest(range(0, w * h * 3))) % 256 AS v
      FROM (SELECT mid, 32 + mid % 32 AS w, 24 + mid % 24 AS h
            FROM docs WHERE mid % 3 = 0)
    ),
    img_agg AS MATERIALIZED (
      SELECT mid, w, h, count(*) AS n,
             CAST(sum(v) AS BIGINT) AS s1, CAST(sum(v * v) AS BIGINT) AS s2
      FROM img_px GROUP BY mid, w, h
    ),
    img_feats AS (
      SELECT mid, 'width' AS feature, CAST(w AS DOUBLE) AS value FROM img_agg
      UNION ALL
      SELECT mid, 'height', CAST(h AS DOUBLE) FROM img_agg
      UNION ALL
      SELECT mid, 'mean_intensity', CAST(s1 AS DOUBLE) / n FROM img_agg
      UNION ALL
      SELECT mid, 'std_intensity',
             sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE)) / n FROM img_agg
    ),
    aud_smp AS (
      SELECT mid, n,
             ((mid * 131 + 11 * unnest(range(0, n))) % 16384) - 8192 AS s
      FROM (SELECT mid, 1600 + mid % 800 AS n FROM docs WHERE mid % 3 = 1)
    ),
    aud_agg AS MATERIALIZED (
      SELECT mid, n, CAST(sum(s * s) AS BIGINT) AS s2
      FROM aud_smp GROUP BY mid, n
    ),
    aud_feats AS (
      SELECT mid, 'sample_rate' AS feature, CAST(16000 AS DOUBLE) AS value
      FROM aud_agg
      UNION ALL
      SELECT mid, 'duration_s', CAST(n AS DOUBLE) / 16000 FROM aud_agg
      UNION ALL
      SELECT mid, 'rms', sqrt(CAST(s2 AS DOUBLE) / n) FROM aud_agg
    ),
    vid_frame_px AS (
      SELECT mid, idx,
             (mid * 31 + 7 * (idx * 576 + unnest(range(0, 576)))) % 256 AS v
      FROM (SELECT mid, unnest([0, (4 + mid % 5) // 2]) AS idx
            FROM docs WHERE mid % 3 = 2)
    ),
    vid_feats AS (
      SELECT mid, 'frame_' || idx || '_mean' AS feature,
             CAST(sum(v) AS DOUBLE) / 576 AS value
      FROM vid_frame_px GROUP BY mid, idx
    ),
    allf AS (
      SELECT mid, 'image' AS kind, feature, value FROM img_feats
      UNION ALL
      SELECT mid, 'audio', feature, value FROM aud_feats
      UNION ALL
      SELECT mid, 'video', feature, value FROM vid_feats
    )
    SELECT mid AS media_id, kind, feature, value
    FROM allf
    ORDER BY media_id, feature
    LIMIT 500
    """


@register("m02_media_features", survey_ids=(), oracle=_M02_ORACLE)
def m02_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode + feature-extract across all three modalities (Arrow-batched
    mapInPandas), melted to long-format (media_id, kind, feature, value)
    rows: image mean/std intensity + dimensions, audio duration/RMS, and
    per-sampled-frame mean intensity."""
    img = image_features(_media_kind(spark, sf_dir, 0)).select(
        "media_id",
        F.lit("image").alias("kind"),
        F.explode(
            F.map_from_arrays(
                F.array(
                    F.lit("width"), F.lit("height"),
                    F.lit("mean_intensity"), F.lit("std_intensity"),
                ),
                F.array(
                    F.col("width").cast("double"),
                    F.col("height").cast("double"),
                    "mean_intensity", "std_intensity",
                ),
            )
        ).alias("feature", "value"),
    )
    aud = audio_features(_media_kind(spark, sf_dir, 1)).select(
        "media_id",
        F.lit("audio").alias("kind"),
        F.explode(
            F.map_from_arrays(
                F.array(
                    F.lit("sample_rate"), F.lit("duration_s"), F.lit("rms")
                ),
                F.array(
                    F.col("sample_rate").cast("double"), "duration_s", "rms"
                ),
            )
        ).alias("feature", "value"),
    )
    vid = sample_frames(_media_kind(spark, sf_dir, 2), k=2).select(
        "media_id",
        F.lit("video").alias("kind"),
        F.concat(F.lit("frame_"), F.col("frame_index"), F.lit("_mean")).alias(
            "feature"
        ),
        F.col("mean_intensity").alias("value"),
    )
    return (
        img.unionByName(aud)
        .unionByName(vid)
        .orderBy("media_id", "feature")
        .limit(500)
    )
