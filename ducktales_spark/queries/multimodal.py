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


@register("m02_image_features", survey_ids=())
def m02_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode + feature-extract images (Arrow-batched mapInPandas)."""
    feats = image_features(_media(spark, sf_dir))
    return feats.orderBy("media_id").limit(100)


@register("m03_audio_features", survey_ids=())
def m03_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    feats = audio_features(_media(spark, sf_dir))
    return feats.orderBy("media_id").limit(100)


@register("m04_frame_sample", survey_ids=())
def m04_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-video frame sampling: one row per sampled frame."""
    return sample_frames(_media(spark, sf_dir), k=2).orderBy(
        "media_id", "frame_index"
    ).limit(200)
