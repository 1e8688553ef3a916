"""Contamination-check operator."""

from pyspark.sql import functions as F

from pixie_spark.operators.dedup import contamination_check


def test_contamination_detects_planted_overlap(spark):
    corpus = spark.createDataFrame(
        [
            (10, "the quick brown fox jumps over the lazy dog today"),
            (11, "completely unrelated words about spark and parquet files"),
        ],
        ["doc_id", "text"],
    )
    probes = spark.createDataFrame(
        [(0, "quick brown fox jumps over the lazy")], ["doc_id", "text"]
    )
    out = {r["doc"]: (r["n_hits"], r["n_probe_docs"]) for r in contamination_check(
        corpus, probes, n=5
    ).collect()}
    assert 10 in out and 11 not in out
    assert out[10][0] >= 1 and out[10][1] == 1


def test_contamination_clean_corpus_empty(spark):
    corpus = spark.createDataFrame([(1, "a b c d e f g")], ["doc_id", "text"])
    probes = spark.createDataFrame([(0, "z y x w v u t")], ["doc_id", "text"])
    assert contamination_check(corpus, probes, n=5).count() == 0
