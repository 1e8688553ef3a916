"""Multimodal plumbing: binary payload columns + mapInPandas featurizer
(decode kernel stubbed — deterministic fake; plumbing real)."""

import pytest
from pyspark.sql import functions as F

from pixie_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    return mm.synthetic_media(spark, n=60)


def test_feature_extraction_plumbing(spark, media):
    out = mm.extract_features(media, fake=True)
    rows = out.collect()
    assert len(rows) == 60
    assert all(len(r["feature"]) == mm.FEATURE_DIM for r in rows)
    assert all(r["payload_bytes"] > 0 for r in rows)
    # deterministic: same payload → same features
    again = {r["media_id"]: r["feature"] for r in mm.extract_features(media, fake=True).collect()}
    for r in rows:
        assert again[r["media_id"]] == r["feature"]


def test_real_decoder_is_lib_gated(spark, media):
    """fake=False runs the Pillow path when installed; without the lib it
    must fail LOUDLY (never silently fall back to the fake)."""
    if mm.have_pillow():
        pytest.skip("Pillow installed; covered by test_real_decode_gating")
    with pytest.raises(Exception) as exc_info:
        mm.extract_features(media, fake=False).collect()
    assert "Pillow" in str(exc_info.value)


def test_frame_sample(spark, media):
    frames = mm.frame_sample(media, every_ms=1000)
    rows = frames.collect()
    assert rows and all(r["frame_ts_ms"] % 1000 == 0 for r in rows)
    # one video with duration 29s → 29 frames at 1s sampling
    vid = media.where(
        (F.col("kind") == "video") & (F.col("meta.duration_ms") == 29000)
    ).first()
    if vid is not None:
        n = frames.where(F.col("media_id") == vid["media_id"]).count()
        assert n == 29


def test_payload_dropped_downstream(spark, media):
    """Featurizer output must not carry the binary payload forward."""
    out = mm.extract_features(media, fake=True)
    assert "payload" not in out.columns


def test_real_decode_gating(spark):
    """fake=False is lib-gated: real Pillow decode when installed, LOUD
    ImportError when not — never a silent fake."""
    from pixie_spark.operators import multimodal as mm

    if not mm.have_pillow():
        with pytest.raises(Exception) as exc:
            mm.extract_features(mm.synthetic_media(spark, n=4), fake=False).collect()
        assert "Pillow" in str(exc.value)
        return
    import io

    import PIL.Image

    buf = io.BytesIO()
    PIL.Image.new("RGB", (32, 32), (128, 64, 32)).save(buf, format="PNG")
    df = spark.createDataFrame(
        [(1, "image", bytearray(buf.getvalue()))], "media_id long, kind string, payload binary"
    )
    (row,) = mm.extract_features(df, fake=False).collect()
    assert len(row["feature"]) == mm.FEATURE_DIM
    assert all(0.0 <= v <= 1.0 for v in row["feature"])
