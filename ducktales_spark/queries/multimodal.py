"""Multimodal pipeline queries (rows-only checks: the decode path is numpy
inside mapInPandas, not SQL-expressible — the pytest suite asserts exact
deterministic values instead; see tests/test_multimodal.py)."""

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


@register("m01_media_catalog", survey_ids=())
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


@register("m02_media_features", survey_ids=())
def m02_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode + feature-extract across all three modalities (Arrow-batched
    mapInPandas), melted to long-format (media_id, kind, feature, value)
    rows: image mean/std intensity + dimensions, audio duration/RMS, and
    per-sampled-frame mean intensity."""
    media = _media(spark, sf_dir)

    img = image_features(media).select(
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
    aud = audio_features(media).select(
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
    vid = sample_frames(media, k=2).select(
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
