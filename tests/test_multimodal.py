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


def test_real_decoder_is_explicit_stub(spark, media):
    with pytest.raises(Exception) as exc_info:
        mm.extract_features(media, fake=False).collect()
    assert "NotImplementedError" in str(exc_info.value) or isinstance(
        exc_info.value, NotImplementedError
    )


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
