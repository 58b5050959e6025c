"""Multimodal operator tests: codec roundtrip, deterministic features, and
the Spark-side plumbing (schemas, batch shapes, per-kind routing)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from ducktales_spark import multimodal as mm


def test_codec_roundtrip():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (24, 32, 3), dtype=np.uint8)
    assert (mm._unpack_image(mm._pack_image(img)) == img).all()
    aud = rng.integers(-1000, 1000, 500).astype("<i2")
    back, rate = mm._unpack_audio(mm._pack_audio(aud, 8000))
    assert rate == 8000 and (back == aud).all()
    vid = rng.integers(0, 256, (5, 12, 16, 3), dtype=np.uint8)
    assert (mm._unpack_video(mm._pack_video(vid)) == vid).all()


def test_decode_external_jpeg_is_stub():
    """Formats the stdlib cannot decode remain the documented plug point."""
    with pytest.raises(NotImplementedError, match="codec"):
        mm.decode_external(b"\xff\xd8", "jpeg")


def test_wav_roundtrip_real_codec():
    """decode_external('wav'): real RIFF/WAVE via the stdlib — mono and
    stereo 16-bit PCM round-trip bit-exactly; non-16-bit is rejected."""
    rng = np.random.default_rng(11)
    mono = rng.integers(-30000, 30000, 777).astype("<i2")
    b = mm.encode_wav(mono, 16000)
    assert b[:4] == b"RIFF" and b[8:12] == b"WAVE"
    back, rate = mm.decode_external(b, "wav")
    assert rate == 16000 and back.dtype == np.int16 and (back == mono).all()
    stereo = rng.integers(-30000, 30000, (400, 2)).astype("<i2")
    back, rate = mm.decode_wav(mm.encode_wav(stereo, 44100))
    assert rate == 44100 and back.shape == (400, 2) and (back == stereo).all()
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1); w.setsampwidth(1); w.setframerate(8000)
        w.writeframes(b"\x00" * 10)
    with pytest.raises(ValueError, match="16-bit"):
        mm.decode_wav(buf.getvalue())


def test_png_roundtrip_all_filters_and_colortypes():
    """decode_external('png'): real PNG via zlib — every scanline filter
    (None/Sub/Up/Average/Paeth) and every 8-bit color type (gray, gray+A,
    RGB, RGBA) reconstructs the exact pixels."""
    rng = np.random.default_rng(13)
    for c in (1, 2, 3, 4):
        img = rng.integers(0, 256, (9, 7, c), dtype=np.uint8)
        for ft in range(5):
            b = mm.encode_png(img, filter_type=ft)
            back = mm.decode_external(b, "png")
            assert back.shape == (9, 7, c), (c, ft)
            assert (back == img).all(), (c, ft)
    # 2-D grayscale input encodes as (h, w, 1)
    g = rng.integers(0, 256, (5, 6), dtype=np.uint8)
    assert (mm.decode_png(mm.encode_png(g)) == g[:, :, None]).all()
    with pytest.raises(ValueError, match="not a PNG"):
        mm.decode_png(b"nope")


def test_real_codec_payloads_flow_through_operators(spark):
    """A corpus mixing real PNG images and real WAV audio flows through the
    same mapInPandas operators as FAKEMEDIA — the decode boundary sniffs
    the payload magic, so the Spark-side plumbing is codec-real."""
    rng = np.random.default_rng(17)
    img = rng.integers(0, 256, (8, 10, 3), dtype=np.uint8)
    aud = rng.integers(-20000, 20000, 1600).astype("<i2")
    rows = [
        (1, "image", bytearray(mm.encode_png(img, filter_type=4)),
         (10, 8, 3, None, None, "png")),
        (2, "audio", bytearray(mm.encode_wav(aud, 16000)),
         (None, None, None, 16000, None, "wav")),
    ]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    feats = {r["media_id"]: r for r in mm.image_features(media).collect()}
    a = img.astype(np.int64)
    n, s1 = a.size, int(a.sum())
    assert feats[1]["width"] == 10 and feats[1]["height"] == 8
    assert feats[1]["mean_intensity"] == s1 / n
    af = {r["media_id"]: r for r in mm.audio_features(media).collect()}
    s = aud.astype(np.int64)
    assert af[2]["n_samples"] == 1600 and af[2]["sample_rate"] == 16000
    assert af[2]["rms"] == float(np.sqrt(int((s * s).sum()) / 1600))
    # STEREO WAV: n_samples/duration count frames, not interleaved samples
    # (regression: flattening doubled both for 2-channel audio)
    st = rng.integers(-20000, 20000, (800, 2)).astype("<i2")
    stereo = spark.createDataFrame(
        [(3, "audio", bytearray(mm.encode_wav(st, 8000)),
          (None, None, None, 8000, None, "wav"))],
        mm.MEDIA_SCHEMA,
    )
    row = mm.audio_features(stereo).collect()[0]
    assert row["n_samples"] == 800 and row["duration_s"] == 0.1
    f = st.astype(np.int64).reshape(-1)
    assert row["rms"] == float(np.sqrt(int((f * f).sum()) / len(f)))
    # resize consumes the PNG payload and re-emits FAKEMEDIA
    small = {r["media_id"]: r for r in mm.resize_images(media, 5, 4).collect()}
    assert small[1]["meta"]["width"] == 5 and small[1]["meta"]["height"] == 4


@pytest.fixture(scope="module")
def media(spark):
    ids = spark.range(0, 30).select(F.col("id").alias("doc_id"))
    return mm.synth_media(ids, "doc_id").cache()


def test_synth_media_schema_and_kinds(spark, media):
    assert media.count() == 30
    kinds = {r["kind"] for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}
    # typed meta struct queryable without decoding payloads
    img_meta = media.filter("kind = 'image'").select(
        "meta.width", "meta.height", "meta.channels", "meta.format"
    ).first()
    assert img_meta["format"] == "fimg" and img_meta["channels"] == 3
    # deterministic: same id -> identical payload across jobs
    b1 = media.filter("media_id = 3").select("data").first()[0]
    ids = spark.range(0, 30).select(F.col("id").alias("doc_id"))
    b2 = mm.synth_media(ids, "doc_id").filter("media_id = 3").select(
        "data"
    ).first()[0]
    assert bytes(b1) == bytes(b2)


def test_image_features_deterministic(spark, media):
    feats = {r["media_id"]: r for r in mm.image_features(media).collect()}
    assert set(feats) == {i for i in range(30) if i % 3 == 0}
    r = feats[3]
    # recompute expected from the closed-form spec: pixel i = (31*mid+7i)%256
    w, h = 32 + 3 % 32, 24 + 3 % 24
    vals = (3 * 31 + 7 * np.arange(h * w * 3, dtype=np.int64)) % 256
    assert (r["width"], r["height"]) == (w, h)
    # exact (not approx): features are integer-sum math, bit-reproducible
    assert r["mean_intensity"] == int(vals.sum()) / vals.size
    s1, s2, n = int(vals.sum()), int((vals * vals).sum()), vals.size
    assert r["std_intensity"] == float(np.sqrt(float(n * s2 - s1 * s1))) / n


def test_resize_images(spark, media):
    resized = mm.resize_images(media, 8, 6)
    imgs = resized.filter("kind = 'image'")
    metas = imgs.select("meta.width", "meta.height").distinct().collect()
    assert [(m["width"], m["height"]) for m in metas] == [(8, 6)]
    # payload really is 8x6: re-decoding through features agrees
    f = mm.image_features(imgs).first()
    assert (f["width"], f["height"]) == (8, 6)
    # non-image rows pass through untouched
    assert resized.count() == media.count()


def test_audio_features(spark, media):
    feats = mm.audio_features(media).collect()
    assert all(r["sample_rate"] == 16000 for r in feats)
    r = {x["media_id"]: x for x in feats}[1]
    n = 1600 + 1 % 800
    assert r["n_samples"] == n
    assert r["duration_s"] == pytest.approx(n / 16000, abs=1e-6)


def test_sample_frames(spark, media):
    frames = mm.sample_frames(media, k=2).collect()
    by_id: dict = {}
    for r in frames:
        by_id.setdefault(r["media_id"], []).append(r["frame_index"])
    # every video contributes exactly k frames, evenly spaced from frame 0
    assert set(by_id) == {i for i in range(30) if i % 3 == 2}
    for mid, idxs in by_id.items():
        nf = 4 + mid % 5
        assert sorted(idxs) == [0, nf // 2]


def test_m02_oracle_parity_odd_doc_ids(spark, tmp_path):
    """The closed-form media corpus + exact-integer-sum features must agree
    with the DuckDB oracle for ANY doc_id set — non-contiguous, large, and
    spanning all three modalities — not just the driver's 0..N-1 ids."""
    import duckdb

    from ducktales_spark.registry import load_all
    from tests.oracle import compare

    ids = [7, 11, 100, 1001, 65535, 999983, 123456789]
    sdf = spark.createDataFrame(
        [(i, f"doc {i}") for i in ids], "doc_id bigint, text string"
    )
    sf_dir = str(tmp_path)
    sdf.coalesce(1).write.parquet(f"{sf_dir}/documents.parquet")
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{sf_dir}/documents.parquet/*.parquet'"
    )
    for name in ("m01_media_catalog", "m02_media_features"):
        spec = load_all()[name]
        mism = compare(spec.fn(spark, sf_dir), con, spec.oracle)
        assert not mism, (name, mism[:5])
