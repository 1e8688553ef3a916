"""Perceptual image hashing + near-duplicate image detection.

The reference engine has no image operators; this family belongs to the
training-data-pipeline extensions (multimodal dedup — the image
counterpart of text MinHash/SimHash). Methods are the standard
perceptual-hash trio (Zauner 2010, "Implementation and Benchmarking of
Perceptual Image Hash Functions"):

- aHash: 8×8 mean-threshold bits.
- dHash: 9-wide×8-high horizontal gradient sign bits (robust default).
- pHash: 32×32 DCT-II, low-frequency 8×8 block, median threshold —
  invariant to linear brightness/contrast scaling by construction
  (coefficients and their median scale together).

Scale design (the simhash/minhash banding story applied to images):

- Payloads are consumed in ONE Arrow-batched ``mapInPandas`` stage that
  emits (id, 8-byte hash) — image bytes never enter a shuffle.
- Candidate generation splits the 64-bit hash into ``bands`` disjoint
  bit-segments. By pigeonhole, two hashes within hamming distance d
  share at least one identical segment whenever bands >= d+1, so recall
  at ``max_hamming <= bands-1`` is EXACT, not probabilistic.
- The per-(band, segment) self-join never materializes: pairs come from
  the dedup family's posting-list in-row expansion with its hot-bucket
  cap, then an exact hamming verify via native ``bit_count(a XOR b)``
  — candidates only, pure JVM.

All decode math is pure numpy over the built-in netpbm parser
(multimodal.decode_ppm_gray); other formats go through Pillow when
installed and raise loudly otherwise — never a silent fake.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pixie_spark.operators.dedup import MAX_POSTING_LIST, _pairs_from_posting_lists
from pixie_spark.operators.multimodal import decode_ppm_gray, have_pillow
from pixie_spark.materialize import materialize

HASH_BITS = 64


def _gray(payload: bytes) -> np.ndarray | None:
    """Full-resolution grayscale plane in [0,1], or None if undecodable.
    Netpbm decodes in pure numpy; other formats are Pillow-gated."""
    g = decode_ppm_gray(payload)
    if g is not None:
        return g
    if not have_pillow():
        return None
    import io

    import PIL.Image

    try:
        img = PIL.Image.open(io.BytesIO(payload)).convert("L")
    except Exception:
        return None
    return np.asarray(img, dtype=np.float32) / 255.0


def _resize(gray: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize — the same index-map scheme as
    decode_ppm, deterministic and dependency-free."""
    h, w = gray.shape
    iy = (np.arange(out_h) * h) // out_h
    ix = (np.arange(out_w) * w) // out_w
    return gray[np.ix_(iy, ix)]


def _bits_to_signed64(bits: np.ndarray) -> int:
    """Pack a length-64 0/1 array (bit i → position i) into the SIGNED
    long Spark's LongType carries; uint64→int64 view keeps bit patterns."""
    val = np.uint64(0)
    for i, b in enumerate(bits):
        if b:
            val |= np.uint64(1) << np.uint64(i)
    return int(val.astype(np.int64))


def ahash_array(gray: np.ndarray) -> int:
    """aHash: 8×8 resize, bit = pixel > mean."""
    g = _resize(gray, 8, 8).reshape(-1)
    return _bits_to_signed64((g > g.mean()).astype(np.uint8))


def dhash_array(gray: np.ndarray) -> int:
    """dHash: 9-wide × 8-high resize, bit (y*8+x) = g[y,x] > g[y,x+1]."""
    g = _resize(gray, 8, 9)
    return _bits_to_signed64((g[:, :-1] > g[:, 1:]).reshape(-1).astype(np.uint8))


_DCT32 = None


def _dct_matrix(n: int = 32) -> np.ndarray:
    """Orthonormal DCT-II basis matrix (n×n), cached — pHash's 2-D DCT
    is two matmuls against it."""
    global _DCT32
    if _DCT32 is None or _DCT32.shape[0] != n:
        k = np.arange(n)[:, None]
        x = np.arange(n)[None, :]
        m = np.cos(np.pi * (2 * x + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
        m[0] /= np.sqrt(2.0)
        _DCT32 = m
    return _DCT32


def phash_array(gray: np.ndarray) -> int:
    """pHash: 32×32 resize → 2-D DCT-II → low-frequency 8×8 block →
    median threshold (DC excluded from the median so a flat image does
    not hash to all-ones). Invariant to linear pixel scaling."""
    g = _resize(gray, 32, 32)
    m = _dct_matrix(32)
    coef = (m @ g @ m.T)[:8, :8].reshape(-1)
    med = np.median(coef[1:])
    return _bits_to_signed64((coef > med).astype(np.uint8))


_METHODS = {"ahash": ahash_array, "dhash": dhash_array, "phash": phash_array}


def image_hashes(
    df: DataFrame,
    method: str = "dhash",
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """(id, phash) per decodable image — one Arrow-batched map stage;
    payloads are consumed here and never shuffled. Undecodable payloads
    are dropped (loudly countable as len(in) - len(out)); pre-filter to
    kind == 'image' rows, this does not dispatch on kind."""
    hash_fn = _METHODS[method]
    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("phash", T.LongType(), False),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                g = _gray(bytes(payload)) if payload is not None else None
                if g is None or g.size == 0:
                    continue
                ids.append(mid)
                hashes.append(hash_fn(g))
            yield pd.DataFrame({id_col: pd.Series(ids, dtype="int64"),
                                "phash": pd.Series(hashes, dtype="int64")})

    return df.select(id_col, payload_col).mapInPandas(kernel, schema=schema)


def _band_segments(bands: int, bits: int = HASH_BITS) -> list[tuple[int, int]]:
    """(offset, width) per band — bits split as evenly as possible."""
    base, extra = divmod(bits, bands)
    segs, off = [], 0
    for b in range(bands):
        w = base + (1 if b < extra else 0)
        segs.append((off, w))
        off += w
    return segs


def phash_near_pairs(
    hashes: DataFrame,
    max_hamming: int = 4,
    bands: int | None = None,
    id_col: str = "media_id",
    max_bucket_size: int | None = MAX_POSTING_LIST,
) -> DataFrame:
    """(id_a, id_b, hamming) pairs with hamming(phash_a, phash_b) <=
    max_hamming. ``bands`` defaults to max_hamming+1 — the pigeonhole
    minimum for exact recall. Shuffle payload is (band, segment, id):
    ~20 bytes/row; candidate pairs expand in-row per bucket (hot-bucket
    capped, see dedup.MAX_POSTING_LIST) and only candidates pay the
    bit_count verify."""
    if bands is None:
        bands = max_hamming + 1
    if not 1 <= bands <= HASH_BITS:
        raise ValueError(f"bands must be in [1, {HASH_BITS}], got {bands}")
    h = F.col("phash")
    entries = hashes.select(
        F.col(id_col).alias("doc"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned(h, off)
                        .bitwiseAND(F.lit((1 << w) - 1))
                        .alias("seg"),
                    )
                    for b, (off, w) in enumerate(_band_segments(bands))
                ]
            )
        ).alias("bb"),
    ).select("doc", F.col("bb.band").alias("band"), F.col("bb.seg").alias("seg"))
    postings = entries.groupBy("band", "seg").agg(F.collect_list("doc").alias("docs"))
    cand = _pairs_from_posting_lists(postings, max_list_size=max_bucket_size)
    ha = hashes.select(F.col(id_col).alias("doc_a"), F.col("phash").alias("ph_a"))
    hb = hashes.select(F.col(id_col).alias("doc_b"), F.col("phash").alias("ph_b"))
    return (
        cand.join(ha, "doc_a").join(hb, "doc_b")
        .withColumn("hamming", F.bit_count(F.col("ph_a").bitwiseXOR(F.col("ph_b"))))
        .where(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def image_dedup_pairs(
    media: DataFrame,
    method: str = "dhash",
    max_hamming: int = 4,
    id_col: str = "media_id",
    payload_col: str = "payload",
    kind_col: str | None = "kind",
) -> DataFrame:
    """End-to-end perceptual image near-dedup: filter to images →
    one-pass hash extraction → banded hamming pairs. Feed the output to
    clustering.connected_components / dedup_keep_canonical exactly like
    the text near-dup families."""
    if kind_col is not None and kind_col in media.columns:
        media = media.where(F.col(kind_col) == "image")
    hashes = image_hashes(media, method=method, id_col=id_col, payload_col=payload_col)
    # the hash frame feeds both the banding index and both verify sides
    hashes = hashes.transform(materialize, eager=False)
    return phash_near_pairs(hashes, max_hamming=max_hamming, id_col=id_col)
