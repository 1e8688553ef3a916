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


def test_real_decoder_all_kinds(spark, media):
    """fake=False decodes image (netpbm), audio (WAV) AND video (DIB-AVI)
    rows for REAL with no libraries; compressed video must fail LOUDLY
    (never silently fall back to the fake)."""
    ok = mm.extract_features(media, fake=False).collect()
    assert len(ok) == 60 and all(len(r["feature"]) == mm.FEATURE_DIM for r in ok)
    h264_like = spark.createDataFrame(
        [(1, "video", bytearray(b"\x00\x00\x00\x01\x67 compressed nal junk"))],
        "media_id long, kind string, payload binary",
    )
    with pytest.raises(Exception) as exc_info:
        mm.extract_features(h264_like, fake=False).collect()
    assert "video decode" in str(exc_info.value)


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
        # compressed formats (PNG magic) need Pillow — loud error, while
        # the netpbm/WAV built-ins keep decoding for real
        png_like = spark.createDataFrame(
            [(1, "image", bytearray(b"\x89PNG\r\n\x1a\n junk"))],
            "media_id long, kind string, payload binary",
        )
        with pytest.raises(Exception) as exc:
            mm.extract_features(png_like, fake=False).collect()
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


# --- real netpbm decode (pure numpy, no image libs) --------------------------


def _ppm(w, h, pixel_fn, maxval=255):
    """Build a binary P6 image; pixel_fn(y, x) -> (r, g, b)."""
    body = bytearray()
    for y in range(h):
        for x in range(w):
            body.extend(pixel_fn(y, x))
    return b"P6\n# test image\n%d %d\n%d\n" % (w, h, maxval) + bytes(body)


def test_decode_ppm_real_values():
    from pixie_spark.operators.multimodal import FEATURE_DIM, decode_ppm

    # constant mid-gray image → every feature exactly 128/255
    img = _ppm(8, 8, lambda y, x: (128, 128, 128))
    feats = decode_ppm(img)
    assert feats is not None and len(feats) == FEATURE_DIM
    assert all(f == pytest.approx(128 / 255, rel=1e-6) for f in feats)


def test_decode_ppm_gradient_and_resize():
    from pixie_spark.operators.multimodal import decode_ppm

    # horizontal gradient: left column black, right column white; 4x4
    # nearest-neighbor sampling of an 8-wide image picks x = 0,2,4,6
    img = _ppm(8, 4, lambda y, x: (x * 36,) * 3)
    feats = decode_ppm(img)
    row = feats[:4]
    assert [round(v * 255) for v in row] == [0, 72, 144, 216]
    # all 4 sampled rows identical (gradient is horizontal)
    assert feats[:4] == pytest.approx(feats[4:8])


def test_decode_pgm_16bit():
    from pixie_spark.operators.multimodal import decode_ppm

    w, h, maxval = 4, 4, 65535
    body = b"".join(
        int(v * 4369).to_bytes(2, "big") for v in range(16)
    )  # 0..15 scaled to 16-bit
    img = b"P5\n4 4\n65535\n" + body
    feats = decode_ppm(img)
    assert feats is not None
    assert feats[0] == pytest.approx(0.0, abs=1e-6)
    assert feats[-1] == pytest.approx(15 * 4369 / 65535, rel=1e-6)


def test_decode_ppm_rejects_non_netpbm():
    from pixie_spark.operators.multimodal import decode_ppm

    assert decode_ppm(b"") is None
    assert decode_ppm(b"\x89PNG\r\n\x1a\n....") is None
    assert decode_ppm(b"P6\n4 4\n255\nshort") is None  # truncated raster


def test_extract_features_real_path_with_ppm(spark):
    """fake=False over netpbm payloads: the REAL decoder runs end-to-end
    through mapInPandas with no image libraries installed."""
    from pixie_spark.operators.multimodal import MEDIA_SCHEMA, extract_features

    img_a = _ppm(8, 8, lambda y, x: (0, 0, 0))
    img_b = _ppm(8, 8, lambda y, x: (255, 255, 255))
    rows = [
        (1, "image", "image/x-portable-pixmap", img_a,
         {"width": 8, "height": 8, "duration_ms": None, "codec": "ppm"}),
        (2, "image", "image/x-portable-pixmap", img_b,
         {"width": 8, "height": 8, "duration_ms": None, "codec": "ppm"}),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r["media_id"]: r["feature"] for r in extract_features(df, fake=False).collect()}
    assert all(v == pytest.approx(0.0, abs=1e-6) for v in out[1])
    assert all(v == pytest.approx(1.0, rel=1e-6) for v in out[2])


# --- real PCM WAV decode (pure numpy, no audio libs) -------------------------


def test_decode_wav_spectral_peak_tracks_frequency():
    """A pure sine's energy must concentrate in the FFT band containing
    its frequency — low tone peaks in an early band, high tone later."""
    import numpy as np

    from pixie_spark.operators.multimodal import FEATURE_DIM, decode_wav
    from pixie_spark.operators.multimodal import _synthetic_wav

    low = decode_wav(_synthetic_wav(0))   # 200 Hz
    high = decode_wav(_synthetic_wav(9))  # 1550 Hz
    assert low is not None and high is not None
    assert len(low) == FEATURE_DIM
    assert int(np.argmax(low)) < int(np.argmax(high))
    assert max(low) == pytest.approx(1.0, rel=1e-6)  # peak-normalized


def test_decode_wav_stereo_and_8bit():
    import numpy as np

    from pixie_spark.operators.multimodal import decode_wav

    # hand-built stereo 8-bit PCM: constant silence (128 = zero level)
    data = bytes([128, 128] * 64)
    fmt = (
        (1).to_bytes(2, "little") + (2).to_bytes(2, "little")
        + (8000).to_bytes(4, "little") + (16000).to_bytes(4, "little")
        + (2).to_bytes(2, "little") + (8).to_bytes(2, "little")
    )
    chunks = (
        b"fmt " + len(fmt).to_bytes(4, "little") + fmt
        + b"data" + len(data).to_bytes(4, "little") + data
    )
    wav = b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WAVE" + chunks
    feats = decode_wav(wav)
    assert feats is not None
    assert all(f == pytest.approx(0.0, abs=1e-6) for f in feats)  # silence


def test_decode_wav_rejects_non_wav():
    from pixie_spark.operators.multimodal import decode_wav

    assert decode_wav(b"") is None
    assert decode_wav(b"RIFFxxxxAVI ....") is None
    assert decode_wav(b"OggS....") is None


def test_extract_features_real_audio_path(spark):
    """fake=False over WAV payloads end-to-end through mapInPandas."""
    from pixie_spark.operators import multimodal as mm

    media = mm.synthetic_media(spark, n=12)
    out = mm.extract_features(
        media.where("kind = 'audio'"), fake=False
    ).collect()
    assert len(out) == 4
    for r in out:
        assert len(r["feature"]) == mm.FEATURE_DIM
        assert max(r["feature"]) == pytest.approx(1.0, rel=1e-5)


def test_decode_media_video_is_loud_error(spark):
    from pixie_spark.operators.multimodal import decode_media

    with pytest.raises(ImportError, match="video decode"):
        decode_media(b"\x00\x01", "video")


# --- real DIB-AVI video decode (pure numpy, no video libs) -------------------


def test_decode_avi_temporal_signature_exact():
    """Synthetic AVI frame k has constant brightness (i*7 + k*16) % 256;
    with 12 frames sampled into 16 slots the signature is exactly
    predictable frame-for-frame."""
    from pixie_spark.operators.multimodal import FEATURE_DIM, _synthetic_avi, decode_avi

    feats = decode_avi(_synthetic_avi(0, n_frames=12))
    assert feats is not None and len(feats) == FEATURE_DIM
    for slot in range(FEATURE_DIM):
        frame = (slot * 12) // FEATURE_DIM
        assert feats[slot] == pytest.approx((frame * 16 % 256) / 255.0, abs=1e-6)


def test_decode_avi_rejects_non_avi_and_compressed():
    from pixie_spark.operators.multimodal import _synthetic_avi, decode_avi

    assert decode_avi(b"") is None
    assert decode_avi(b"RIFFxxxxWAVEdata") is None  # WAV, not AVI
    assert decode_avi(b"\x00\x00\x00\x01\x67junk") is None  # h264-ish
    # flip biCompression to a nonzero fourcc: decoder must refuse (the
    # caller then raises the loud external-codec error)
    avi = bytearray(_synthetic_avi(1))
    pos = avi.find(b"strf")
    assert pos > 0
    avi[pos + 8 + 16 : pos + 8 + 20] = b"MJPG"
    assert decode_avi(bytes(avi)) is None


def test_decode_avi_32bit_and_topdown():
    """32-bit BGRX frames with negative biHeight (top-down rows) decode
    to the same brightness as the 24-bit bottom-up build."""
    import numpy as np

    from pixie_spark.operators.multimodal import decode_avi

    def chunk(cid, body):
        return cid + len(body).to_bytes(4, "little") + body + (b"\x00" if len(body) & 1 else b"")

    def lst(ltype, body):
        return chunk(b"LIST", ltype + body)

    def u32(*vals):
        return b"".join(v.to_bytes(4, "little", signed=v < 0) for v in vals)

    w = h = 4
    frames = b"".join(chunk(b"00db", bytes([k * 32] * (w * 4)) * h) for k in range(4))
    avih = u32(33333, 0, 0, 0, 4, 0, 1, 0, w, h, 0, 0, 0, 0)
    strh = b"vids" + b"DIB " + u32(0, 0, 0, 1, 30, 0, 4, 0, 0, 0, 0, 0)
    strf = u32(40, w, -h) + (1).to_bytes(2, "little") + (32).to_bytes(2, "little") + u32(
        0, w * 4 * h, 0, 0, 0, 0
    )
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    body = b"AVI " + hdrl + lst(b"movi", frames)
    avi = b"RIFF" + len(body).to_bytes(4, "little") + body
    feats = decode_avi(avi)
    assert feats is not None
    sampled = feats[np.arange(16)] if hasattr(feats, "__getitem__") else feats
    for slot in range(16):
        frame = (slot * 4) // 16
        assert sampled[slot] == pytest.approx(frame * 32 / 255.0, abs=1e-6)


def test_extract_features_real_video_path(spark):
    """fake=False over AVI payloads end-to-end through mapInPandas."""
    from pixie_spark.operators import multimodal as mm

    media = mm.synthetic_media(spark, n=12)
    out = mm.extract_features(media.where("kind = 'video'"), fake=False).collect()
    assert len(out) == 4
    for r in out:
        assert len(r["feature"]) == mm.FEATURE_DIM
        assert all(0.0 <= v <= 1.0 for v in r["feature"])


def test_extract_frames_real_decode(spark):
    """Per-frame extraction over real AVI payloads: 12 frames per video,
    stride sampling honored, exact brightness per frame."""
    from pixie_spark.operators import multimodal as mm

    media = mm.synthetic_media(spark, n=9)  # ids 2, 5, 8 are video
    frames = mm.extract_frames(media, every_n=1).collect()
    by_media = {}
    for r in frames:
        by_media.setdefault(r["media_id"], []).append(r)
    assert set(by_media) == {2, 5, 8}
    for mid, rows in by_media.items():
        assert len(rows) == 12
        for r in rows:
            assert (r["width"], r["height"]) == (8, 8)
            expected = ((mid * 7 + r["frame_idx"] * 16) % 256) / 255.0
            assert r["mean_gray"] == pytest.approx(expected, abs=1e-6)
            assert len(r["feature"]) == mm.FEATURE_DIM
            assert all(v == pytest.approx(expected, abs=1e-6) for v in r["feature"])
    sampled = mm.extract_frames(media, every_n=4).collect()
    assert sorted({r["frame_idx"] for r in sampled}) == [0, 4, 8]


def test_extract_frames_skips_undecodable(spark):
    from pixie_spark.operators import multimodal as mm

    df = spark.createDataFrame(
        [(1, "video", bytearray(b"\x00\x00\x00\x01 not avi"))],
        "media_id long, kind string, payload binary",
    )
    assert mm.extract_frames(df).count() == 0
