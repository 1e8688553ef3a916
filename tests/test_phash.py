"""Perceptual image hashing + hamming-banded near-dedup
(operators/phash): hash math vs hand-computed references, exact-recall
pigeonhole guarantee at bands = max_hamming+1, brute-force pair-set
equality, pHash brightness invariance, and the end-to-end media path."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pixie_spark.operators import phash as ph
from pixie_spark.operators.multimodal import synthetic_media


def _ppm(arr: np.ndarray) -> bytes:
    """P6 payload from an (h, w) uint8 gray array (replicated to RGB)."""
    h, w = arr.shape
    body = np.repeat(arr.reshape(h, w, 1), 3, axis=2).astype(np.uint8)
    return b"P6\n%d %d\n255\n" % (w, h) + body.tobytes()


def _base_image(i: int, side: int = 16) -> np.ndarray:
    rng = np.random.default_rng(1000 + i)
    return rng.integers(0, 256, size=(side, side), dtype=np.uint8).astype(np.uint8)


def _hamming(a: int, b: int) -> int:
    return bin((a ^ b) & (2**64 - 1)).count("1")


# ---------------------------------------------------------------- hash math


def test_dhash_matches_hand_computation():
    arr = _base_image(0)
    g = arr.astype(np.float32) / 255.0
    got = ph.dhash_array(g)
    rg = ph._resize(g, 8, 9)
    expect_bits = (rg[:, :-1] > rg[:, 1:]).reshape(-1)
    expect = 0
    for i, b in enumerate(expect_bits):
        if b:
            expect |= 1 << i
    assert (got & (2**64 - 1)) == expect or got == np.uint64(expect).astype(np.int64)


def test_hashes_deterministic_and_discriminative():
    imgs = [_base_image(i) for i in range(8)]
    for method in ("ahash", "dhash", "phash"):
        fn = ph._METHODS[method]
        hs = [fn(a.astype(np.float32) / 255.0) for a in imgs]
        hs2 = [fn(a.astype(np.float32) / 255.0) for a in imgs]
        assert hs == hs2, method
        # random images should be mutually far (expected hamming ~32)
        for i in range(len(hs)):
            for j in range(i + 1, len(hs)):
                assert _hamming(hs[i], hs[j]) > 10, method


def test_phash_brightness_invariance():
    arr = _base_image(3)
    bright = (arr.astype(np.float32) * 0.5).astype(np.uint8)
    h1 = ph.phash_array(arr.astype(np.float32) / 255.0)
    h2 = ph.phash_array(bright.astype(np.float32) / 255.0)
    # linear scaling preserves DCT comparisons up to uint8 rounding
    assert _hamming(h1, h2) <= 6
    # aHash is also mean-relative; dHash is gradient-sign — both should
    # stay close under pure brightness scaling
    a1 = ph.ahash_array(arr.astype(np.float32) / 255.0)
    a2 = ph.ahash_array(bright.astype(np.float32) / 255.0)
    assert _hamming(a1, a2) <= 6


def test_noisy_copy_is_near_original_images():
    arr = _base_image(5)
    noisy = arr.copy()
    noisy[2, 3] = min(255, int(noisy[2, 3]) + 4)  # sub-threshold pixel nudge
    h1 = ph.dhash_array(arr.astype(np.float32) / 255.0)
    h2 = ph.dhash_array(noisy.astype(np.float32) / 255.0)
    assert _hamming(h1, h2) <= 4


# ------------------------------------------------------------- banding math


def test_band_segments_cover_all_bits_disjointly():
    for bands in (1, 3, 5, 8, 64):
        segs = ph._band_segments(bands)
        assert len(segs) == bands
        covered = []
        for off, w in segs:
            covered.extend(range(off, off + w))
        assert covered == list(range(64))


def test_pigeonhole_exact_recall_on_crafted_hashes(spark):
    """Pairs at hamming EXACTLY max_hamming must be found when bands =
    max_hamming+1 (pigeonhole), and pairs beyond the threshold must not
    appear."""
    base = 0x0123456789ABCDEF
    d4 = base ^ 0b1111  # hamming 4
    d5 = base ^ 0b11111  # hamming 5
    far = ~base & (2**64 - 1)  # hamming 64
    to_signed = lambda v: int(np.uint64(v).astype(np.int64))
    hashes = spark.createDataFrame(
        [(1, to_signed(base)), (2, to_signed(d4)), (3, to_signed(d5)), (4, to_signed(far))],
        "media_id long, phash long",
    )
    pairs = {
        (r.doc_a, r.doc_b): r.hamming
        for r in ph.phash_near_pairs(hashes, max_hamming=4).collect()
    }
    assert pairs[(1, 2)] == 4  # exactly at threshold: guaranteed found
    assert (1, 3) not in pairs and (3, 1) not in pairs  # beyond threshold
    assert (2, 3) in pairs and pairs[(2, 3)] == 1  # d4^d5 = one bit


def test_near_pairs_match_bruteforce(spark):
    """Full pair-set equality against an all-pairs Python reference on a
    corpus with planted near-duplicates."""
    rows = []
    for i in range(20):
        arr = _base_image(i)
        rows.append((i, _ppm(arr)))
        if i < 6:  # planted near-dup: tiny pixel nudge
            noisy = arr.copy()
            noisy[1, 1] = min(255, int(noisy[1, 1]) + 3)
            rows.append((100 + i, _ppm(noisy)))
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    hashes_df = ph.image_hashes(media, method="dhash")
    hashes = {r.media_id: r.phash for r in hashes_df.collect()}
    assert len(hashes) == len(rows)

    max_h = 6
    expect = set()
    ids = sorted(hashes)
    for i_, a in enumerate(ids):
        for b in ids[i_ + 1 :]:
            if _hamming(hashes[a], hashes[b]) <= max_h:
                expect.add((a, b))
    got = {
        (min(r.doc_a, r.doc_b), max(r.doc_a, r.doc_b))
        for r in ph.phash_near_pairs(hashes_df, max_hamming=max_h).collect()
    }
    assert got == expect
    # every planted duplicate is found
    for i in range(6):
        assert (i, 100 + i) in got


def test_undecodable_payloads_dropped(spark):
    rows = [(1, _ppm(_base_image(1))), (2, b"not an image"), (3, None)]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    out = ph.image_hashes(media).collect()
    assert [r.media_id for r in out] == [1]


def test_image_dedup_pairs_end_to_end(spark):
    """Mixed media table (images + audio + video): only image near-dups
    surface; the planted copy pairs with its original."""
    media = synthetic_media(spark, n=30)
    base = media.where("media_id = 0").first()  # an image row
    extra = spark.createDataFrame(
        [(999, "image", base.mime, bytes(base.payload), base.meta)], media.schema
    )
    pairs = ph.image_dedup_pairs(media.unionByName(extra), max_hamming=2).collect()
    keys = {(r.doc_a, r.doc_b) for r in pairs}
    assert (0, 999) in keys or (999, 0) in keys
    exact = [r for r in pairs if {r.doc_a, r.doc_b} == {0, 999}][0]
    assert exact.hamming == 0
    image_ids = {i for i in range(30) if i % 3 == 0} | {999}
    for r in pairs:
        assert r.doc_a in image_ids and r.doc_b in image_ids
