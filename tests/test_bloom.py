"""Bloom-filter decontamination (operators/dedup.py): no false
negatives vs the exact broadcast-join checker, bounded false-positive
inflation, self-containment of the probe docs."""

from __future__ import annotations

from pyspark.sql import functions as F

from pixie_spark.operators import dedup as dd
from pixie_spark.sources import load_table

N = 5


def _fixture(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    probes = docs.where(F.col("doc_id") < 20)
    return docs, probes


def test_bloom_superset_of_exact(spark, sf_dir):
    docs, probes = _fixture(spark, sf_dir)
    bits = dd.shingle_bloom_bits(probes, n=N, n_bits=1 << 20)
    bloom_docs = {
        r["doc"] for r in dd.bloom_contamination_check(docs, bits, n=N).collect()
    }
    exact_docs = {
        r["doc"] for r in dd.contamination_check(docs, probes, n=N).collect()
    }
    # Bloom filters have no false negatives: every exact hit must appear
    assert exact_docs <= bloom_docs
    # probe docs contain their own shingles, so all must be flagged
    probe_ids = {r["doc_id"] for r in probes.collect()}
    assert probe_ids <= bloom_docs
    # FP sanity at 2^20 bits / 4 hashes on a fixture-sized probe set:
    # the false-positive inflation stays a small fraction of the corpus
    n_corpus = docs.count()
    assert len(bloom_docs - exact_docs) <= max(5, n_corpus // 20), (
        len(bloom_docs), len(exact_docs), n_corpus,
    )


def test_bloom_bits_shape(spark, sf_dir):
    _, probes = _fixture(spark, sf_dir)
    bits = dd.shingle_bloom_bits(probes, n=N, n_bits=1 << 16)
    assert len(bits) == (1 << 16) // 64
    assert any(w != 0 for w in bits)


def test_bloom_hit_counts_vs_position_level_truth(spark, sf_dir):
    """bloom n_hits counts shingle POSITIONS passing the filter; it must
    be >= the true per-doc count of positions whose shingle is really
    in the probe set (no false negatives), for every document."""
    docs, probes = _fixture(spark, sf_dir)
    bits = dd.shingle_bloom_bits(probes, n=N, n_bits=1 << 20)
    bloom = {
        r["doc"]: r["n_hits"]
        for r in dd.bloom_contamination_check(docs, bits, n=N).collect()
    }
    probe_sids = dd._hashed_shingle_rows(probes, "doc_id", "text", N).select("sid").distinct()
    truth = {
        r["doc"]: r["n_true"]
        for r in dd._hashed_shingle_rows(docs, "doc_id", "text", N)
        .join(probe_sids, "sid", "left_semi")
        .groupBy("doc")
        .agg(F.count(F.lit(1)).alias("n_true"))
        .collect()
    }
    for doc, n_true in truth.items():
        assert bloom.get(doc, 0) >= n_true, (doc, bloom.get(doc), n_true)


def test_bloom_empty_probe_set(spark):
    """No probes -> all-zero bitset -> zero hits anywhere."""
    empty = spark.createDataFrame([], "doc_id long, text string")
    docs = spark.createDataFrame(
        [(1, "a b c d e f g h")], "doc_id long, text string"
    )
    bits = dd.shingle_bloom_bits(empty, n=3, n_bits=1 << 12)
    assert sum(bits) == 0
    assert dd.bloom_contamination_check(docs, bits, n=3).count() == 0
