"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

``decode_image`` runs a REAL Pillow decode→resize→featurize whenever
Pillow is installed (lib-gated; ImportError otherwise — never a silent
fake). With ``fake=True`` a deterministic fake decoder (seeded by
content hash) produces stable "features" so the Spark-side plumbing —
schema, batch iteration, partitioning, column pruning — is fully real
and testable in containers without image libraries.

At 100 TB: binary payloads stay out of shuffles (process in the map
stage, carry only extracted features + metadata forward); batch size is
governed by spark.sql.execution.arrow.maxRecordsPerBatch so a partition
of large blobs never materializes as one giant pandas block.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                    T.StructField("codec", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("payload_bytes", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def _fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for a real decode+featurize kernel: features
    derived from a sha256 of the payload. Stable across runs/machines."""
    digest = hashlib.sha256(payload or b"").digest()
    raw = np.frombuffer(digest[: FEATURE_DIM * 2], dtype=np.uint16).astype(np.float32)
    return raw / 65535.0


def have_pillow() -> bool:
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def decode_ppm_gray(payload: bytes) -> np.ndarray | None:
    """Full-resolution grayscale decode for binary PPM/PGM (P6/P5) in
    pure numpy — no image library needed. Parses the netpbm header
    (whitespace-separated width/height/maxval tokens, '#' comments
    allowed), reads the raw sample plane, and gray-converts (P6 channel
    mean). Returns an (h, w) float array in [0, 1], or None when the
    payload is not a binary netpbm file. decode_ppm (the FEATURE_DIM
    featurizer) and operators/phash (perceptual hashing, which needs the
    full-resolution plane) both build on this single parser."""
    if not payload or payload[:2] not in (b"P6", b"P5"):
        return None
    # tokenize header: magic, width, height, maxval; comments run to EOL
    tokens: list[bytes] = []
    i = 2
    while len(tokens) < 3 and i < len(payload):
        c = payload[i : i + 1]
        if c == b"#":
            i = payload.find(b"\n", i)
            if i < 0:  # truncated comment: malformed, not our format
                return None
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < len(payload) and not payload[j : j + 1].isspace():
                j += 1
            tokens.append(payload[i:j])
            i = j
    if len(tokens) < 3:
        return None
    try:
        w, h, maxval = (int(t) for t in tokens)
    except ValueError:  # non-numeric header tokens: not a netpbm file
        return None
    i += 1  # single whitespace byte separates header from raster
    channels = 3 if payload[:2] == b"P6" else 1
    dtype = np.dtype(">u2") if maxval > 255 else np.dtype(np.uint8)
    need = w * h * channels * dtype.itemsize
    raster = payload[i : i + need]
    if len(raster) < need or w <= 0 or h <= 0:
        return None
    arr = np.frombuffer(raster, dtype=dtype).reshape(h, w, channels).astype(np.float32)
    return arr.mean(axis=2) / float(maxval)


def decode_ppm(payload: bytes) -> np.ndarray | None:
    """REAL image decode for binary PPM/PGM via decode_ppm_gray,
    nearest-neighbor resized to √FEATURE_DIM per side — FEATURE_DIM
    floats in [0,1], the same feature contract as every other decode
    path. Returns None when the payload is not a binary netpbm file."""
    gray = decode_ppm_gray(payload)
    if gray is None:
        return None
    h, w = gray.shape
    side = int(FEATURE_DIM**0.5)
    iy = (np.arange(side) * h) // side
    ix = (np.arange(side) * w) // side
    return gray[np.ix_(iy, ix)].reshape(-1)[:FEATURE_DIM]


def decode_wav(payload: bytes) -> np.ndarray | None:
    """REAL audio decode for RIFF/WAVE PCM in pure numpy — no audio
    library needed. Walks the RIFF chunk list to find fmt/data, reads
    8-/16-bit PCM (mono or multichannel, channel-averaged), and
    featurizes as the log-energy of FEATURE_DIM equal FFT bands
    (np.fft.rfft) normalized to [0,1] — a real spectral signature with
    the same FEATURE_DIM-float contract as the image path. Returns None
    when the payload is not a PCM WAV file."""
    if not payload or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    pos, n = 12, len(payload)
    fmt = data = None
    while pos + 8 <= n:
        cid = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None or len(fmt) < 16:
        return None
    audio_format = int.from_bytes(fmt[0:2], "little")
    channels = int.from_bytes(fmt[2:4], "little") or 1
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_format != 1 or bits not in (8, 16):  # PCM only
        return None
    if bits == 16:
        x = np.frombuffer(data[: len(data) - (len(data) % 2)], dtype="<i2").astype(
            np.float32
        ) / 32768.0
    else:
        x = (np.frombuffer(data, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    if channels > 1:
        x = x[: len(x) - (len(x) % channels)].reshape(-1, channels).mean(axis=1)
    if not len(x):
        return None
    spec = np.abs(np.fft.rfft(x)) ** 2
    bands = np.array_split(spec, FEATURE_DIM)
    energy = np.array([b.sum() for b in bands], dtype=np.float64)
    loge = np.log1p(energy)
    peak = loge.max()
    return (loge / peak if peak > 0 else loge).astype(np.float32)


def _walk_riff(buf: bytes, pos: int, end: int):
    """Yield (fourcc, body) for every leaf chunk in a RIFF chunk list,
    recursing through LIST containers in document order."""
    while pos + 8 <= end:
        cid = buf[pos : pos + 4]
        size = int.from_bytes(buf[pos + 4 : pos + 8], "little")
        body_start = pos + 8
        body_end = min(body_start + size, end)
        if cid == b"LIST":
            yield from _walk_riff(buf, body_start + 4, body_end)
        else:
            yield cid, buf[body_start:body_end]
        pos = body_start + size + (size & 1)  # chunks are word-aligned


def _decode_dib_frame(frame: bytes, w: int, h: int, bits: int, bottom_up: bool) -> np.ndarray | None:
    """Decode one uncompressed DIB (BI_RGB) frame to a (h, w) float32 gray
    plane. 24-bit BGR and 32-bit BGRX; rows padded to 4-byte boundaries;
    bottom-up row order unless biHeight was negative."""
    bpp = bits // 8
    stride = ((w * bpp + 3) // 4) * 4
    if len(frame) < stride * h:
        return None
    arr = np.frombuffer(frame[: stride * h], dtype=np.uint8).reshape(h, stride)
    px = arr[:, : w * bpp].reshape(h, w, bpp)[:, :, :3].astype(np.float32)
    gray = px.mean(axis=2)
    return gray[::-1] if bottom_up else gray


def _avi_video_stream(payload: bytes):
    """Parse an AVI container: returns (frame_chunks, w, h, bits,
    bottom_up) for the first uncompressed-DIB 'vids' stream, or None when
    the payload is not an AVI / the codec is compressed. Walks the RIFF
    chunk tree pairing each ``strh`` stream header with its ``strf``
    format block; frame data are that stream's ``##db``/``##dc`` movi
    chunks in presentation order."""
    if not payload or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        return None
    streams: list[dict] = []  # (fccType, strf) pairs in strl order
    frames: list[bytes] = []
    vid_idx = -1
    for cid, body in _walk_riff(payload, 12, len(payload)):
        if cid == b"strh":
            streams.append({"type": body[:4], "strf": None})
        elif cid == b"strf" and streams and streams[-1]["strf"] is None:
            streams[-1]["strf"] = body
        elif len(cid) == 4 and cid[2:4] in (b"db", b"dc"):
            if vid_idx < 0:
                vid_idx = next(
                    (i for i, s in enumerate(streams) if s["type"] == b"vids"), -1
                )
            if vid_idx >= 0 and cid[:2] == b"%02d" % vid_idx:
                frames.append(body)
    if vid_idx < 0 or not frames:
        return None
    strf = streams[vid_idx]["strf"]
    if strf is None or len(strf) < 40:
        return None
    w = int.from_bytes(strf[4:8], "little", signed=True)
    h_signed = int.from_bytes(strf[8:12], "little", signed=True)
    bits = int.from_bytes(strf[14:16], "little")
    compression = int.from_bytes(strf[16:20], "little")
    h = abs(h_signed)
    if compression != 0 or bits not in (24, 32) or w <= 0 or h == 0:
        return None  # compressed codecs need external libs — loud upstream
    return frames, w, h, bits, h_signed > 0


def decode_avi(payload: bytes) -> np.ndarray | None:
    """REAL video decode for AVI containers with uncompressed DIB frames
    in pure numpy — no video library needed (same no-dependency contract
    as decode_ppm/decode_wav). Parses the container (_avi_video_stream),
    decodes BI_RGB 24/32-bit frames, and featurizes as the mean
    luminance of FEATURE_DIM evenly-sampled frames in [0,1] — a temporal
    brightness signature with the same FEATURE_DIM-float contract as the
    image/audio paths. Returns None when the payload is not an AVI or
    the codec is compressed (caller raises loudly; see reference
    src/carnot behavior of failing rather than faking)."""
    parsed = _avi_video_stream(payload)
    if parsed is None:
        return None
    frames, w, h, bits, bottom_up = parsed
    idx = (np.arange(FEATURE_DIM) * len(frames)) // FEATURE_DIM
    feats = np.zeros(FEATURE_DIM, dtype=np.float32)
    for k, fi in enumerate(idx):
        gray = _decode_dib_frame(frames[int(fi)], w, h, bits, bottom_up)
        if gray is None:
            return None
        feats[k] = gray.mean() / 255.0
    return feats


def decode_image(payload: bytes) -> np.ndarray:
    """Real image decode+featurize with the same FEATURE_DIM-float
    contract as the fake path (so downstream ANN/kmeans plumbing is
    identical): binary PPM/PGM decodes in pure numpy (decode_ppm — real,
    zero dependencies); every other format goes through Pillow when it is
    installed and raises ImportError otherwise — the caller chose
    fake=False, so a silent fake would be a correctness lie.
    """
    ppm = decode_ppm(payload)
    if ppm is not None:
        return ppm
    if not have_pillow():
        raise ImportError(
            "non-netpbm image decode needs Pillow; use P6/P5 payloads for "
            "the built-in decoder or extract_features(fake=True) for the "
            "deterministic stub"
        )
    import io

    import PIL.Image

    side = int(FEATURE_DIM**0.5)
    img = PIL.Image.open(io.BytesIO(payload)).convert("L").resize((side, side))
    return np.asarray(img, dtype=np.float32).reshape(-1)[:FEATURE_DIM] / 255.0


def decode_media(payload: bytes, kind: str) -> np.ndarray:
    """Kind-dispatched real decode: images via decode_image (netpbm
    built-in, Pillow lib-gated beyond), audio via decode_wav (PCM WAV
    built-in), video via decode_avi (uncompressed-DIB AVI built-in).
    Compressed codecs need external libs — loud error, never a silent
    fake."""
    if kind == "image":
        return decode_image(payload)
    if kind == "audio":
        wav = decode_wav(payload)
        if wav is not None:
            return wav
        raise ImportError(
            "non-WAV audio decode needs external codecs; use PCM WAV "
            "payloads for the built-in decoder or extract_features(fake=True)"
        )
    avi = decode_avi(payload)
    if avi is not None:
        return avi
    raise ImportError(
        "compressed video decode needs external codecs; use uncompressed-DIB "
        "AVI payloads for the built-in decoder or extract_features(fake=True)"
    )


def extract_features(df: DataFrame, fake: bool = True) -> DataFrame:
    """mapInPandas featurizer over a media table.

    Arrow-batched; the binary column is consumed here and dropped from the
    output so downstream stages never shuffle payloads.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                if fake:
                    feats.append(_fake_decode(bytes(payload) if payload is not None else b""))
                else:
                    feats.append(decode_media(payload, kind))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload_bytes": pdf["payload"].map(lambda p: len(p) if p is not None else 0),
                    "feature": [f.tolist() for f in feats],
                }
            )

    return df.mapInPandas(kernel, schema=FEATURES_SCHEMA)


def _synthetic_ppm(i: int, w: int = 8, h: int = 8) -> bytes:
    """Deterministic REAL P6 image for media id ``i``: a per-id shifted
    gradient, decodable by decode_ppm with exactly predictable features."""
    body = bytearray()
    for y in range(h):
        for x in range(w):
            v = (x * 31 + y * 17 + i * 7) % 256
            body.extend((v, v, v))
    return b"P6\n%d %d\n255\n" % (w, h) + bytes(body)


def _synthetic_wav(i: int, n_samples: int = 256, rate: int = 8000) -> bytes:
    """Deterministic REAL PCM WAV for media id ``i``: a 16-bit sine whose
    frequency depends on the id, so spectral features differ per id."""
    t = np.arange(n_samples)
    freq = 200 + (i % 10) * 150
    x = (np.sin(2 * np.pi * freq * t / rate) * 0.5 * 32767).astype("<i2")
    data = x.tobytes()
    fmt = (
        (1).to_bytes(2, "little")  # PCM
        + (1).to_bytes(2, "little")  # mono
        + rate.to_bytes(4, "little")
        + (rate * 2).to_bytes(4, "little")
        + (2).to_bytes(2, "little")
        + (16).to_bytes(2, "little")
    )
    chunks = (
        b"fmt " + len(fmt).to_bytes(4, "little") + fmt
        + b"data" + len(data).to_bytes(4, "little") + data
    )
    return b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WAVE" + chunks


def _synthetic_avi(i: int, w: int = 8, h: int = 8, n_frames: int = 12) -> bytes:
    """Deterministic REAL AVI for media id ``i``: uncompressed 24-bit DIB
    frames whose constant brightness steps per frame, so the temporal
    luminance signature from decode_avi is exactly predictable."""

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + len(body).to_bytes(4, "little") + body + (b"\x00" if len(body) & 1 else b"")

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    def u32(*vals: int) -> bytes:
        return b"".join(v.to_bytes(4, "little", signed=v < 0) for v in vals)

    stride = ((w * 3 + 3) // 4) * 4
    frames = b""
    for k in range(n_frames):
        v = (i * 7 + k * 16) % 256
        row = bytes([v] * (w * 3)) + b"\x00" * (stride - w * 3)
        frames += chunk(b"00db", row * h)
    avih = u32(33333, 0, 0, 0, n_frames, 0, 1, 0, w, h, 0, 0, 0, 0)
    strh = b"vids" + b"DIB " + u32(0, 0, 0, 1, 30, 0, n_frames, 0, 0, 0, 0, 0)
    strf = u32(40, w, h) + (1).to_bytes(2, "little") + (24).to_bytes(2, "little") + u32(
        0, stride * h, 0, 0, 0, 0
    )
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", frames)
    body = b"AVI " + hdrl + movi
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def synthetic_media(spark, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic media table for tests: image rows carry REAL binary
    PPM payloads, audio rows REAL PCM WAV payloads, video rows REAL
    uncompressed-DIB AVI payloads — every kind decodable by the built-in
    pure-numpy decoders (seed kept for signature stability)."""
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        if kind == "image":
            payload = _synthetic_ppm(i)
        elif kind == "audio":
            payload = _synthetic_wav(i)
        else:
            payload = _synthetic_avi(i)
        meta = {
            "width": 8 if kind != "audio" else None,
            "height": 8 if kind != "audio" else None,
            "duration_ms": 1000 * (i % 30) if kind != "image" else None,
            "codec": {"image": "ppm", "audio": "pcm_s16le", "video": "rawvideo"}[kind],
        }
        rows.append((i, kind, f"{kind}/x", payload, meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def frame_sample(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling PLAN: one output row per sampled frame
    timestamp, derived from metadata only — no payload is touched. Uses
    sequence+explode so the frame expansion happens JVM-side; feed the
    sampled (media_id, frame_ts_ms) set to a decode stage (or use
    extract_frames for stride sampling with real decode)."""
    return (
        df.where(F.col("kind") == "video")
        .withColumn(
            "frame_ts_ms",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.coalesce(F.col("meta.duration_ms"), F.lit(0)) - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ),
        )
        .select("media_id", "frame_ts_ms", "mime")
    )


FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("mean_gray", T.FloatType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def extract_frames(df: DataFrame, every_n: int = 1) -> DataFrame:
    """REAL video frame extraction over a media table: decode every
    ``every_n``-th frame of each uncompressed-DIB AVI payload and emit
    one row per sampled frame with its dimensions, mean luminance, and a
    FEATURE_DIM spatial-grid feature (nearest-neighbor downsample — the
    image path's contract per frame). Non-AVI/compressed video rows are
    passed over silently (this is an extraction scan, not a decode
    assertion — use extract_features(fake=False) for loud decode).

    Arrow-batched mapInPandas: payloads are consumed in the map stage;
    only small per-frame rows flow downstream, so frame rows (not
    payloads) are what any later shuffle moves.
    """
    side = int(FEATURE_DIM**0.5)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("media_id", "frame_idx", "width", "height", "mean_gray", "feature")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                parsed = _avi_video_stream(bytes(payload) if payload is not None else b"")
                if parsed is None:
                    continue
                frames, w, h, bits, bottom_up = parsed
                iy = (np.arange(side) * h) // side
                ix = (np.arange(side) * w) // side
                for fi in range(0, len(frames), every_n):
                    gray = _decode_dib_frame(frames[fi], w, h, bits, bottom_up)
                    if gray is None:
                        continue
                    out["media_id"].append(mid)
                    out["frame_idx"].append(fi)
                    out["width"].append(w)
                    out["height"].append(h)
                    out["mean_gray"].append(float(gray.mean()) / 255.0)
                    out["feature"].append(
                        (gray[np.ix_(iy, ix)] / 255.0).reshape(-1)[:FEATURE_DIM].astype(np.float32).tolist()
                    )
            if out["media_id"]:  # empty pandas frames carry no Arrow types
                yield pd.DataFrame(out)

    cols = df.select("media_id", "payload")
    if "kind" in df.columns:
        cols = df.where(F.col("kind") == "video").select("media_id", "payload")
    return cols.mapInPandas(kernel, schema=FRAMES_SCHEMA)
