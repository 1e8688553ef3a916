"""Fixture-level golden values for the round-4 fourth-batch operators
(lm_perplexity, nb_classify, ann_ivfpq_topk): these are rows-only in the
driver gate (the 50-entry oracle window is full), so — per the corpus
convention — exact expected outputs on the sf0.001 fixtures are pinned
here, computed once from the seeded deterministic tables."""

import pytest
from pytest import approx

from pixie_spark.queries import QUERIES


def test_lm_perplexity_golden(spark, sf_dir):
    if "sf0.001" not in sf_dir:
        pytest.skip("goldens pinned for sf0.001")
    rows = QUERIES["lm_perplexity"].fn(spark, sf_dir).limit(5).collect()
    got = [(r["doc_id"], r["n_tokens"], r["perplexity"]) for r in rows]
    want = [
        (0, 23, 31.598461), (1, 78, 30.319384), (2, 65, 29.969379),
        (3, 49, 31.156504), (4, 31, 30.044514),
    ]
    assert [(g[0], g[1]) for g in got] == [(w[0], w[1]) for w in want]
    assert [g[2] for g in got] == approx([w[2] for w in want], abs=1e-6)


def test_nb_classify_golden(spark, sf_dir):
    if "sf0.001" not in sf_dir:
        pytest.skip("goldens pinned for sf0.001")
    df = QUERIES["nb_classify"].fn(spark, sf_dir)
    first10 = [(r["doc_id"], r["label"]) for r in df.limit(10).collect()]
    assert first10 == [
        (0, "es"), (1, "zh"), (2, "de"), (3, "de"), (4, "es"),
        (5, "zh"), (6, "en"), (7, "en"), (8, "en"), (9, "es"),
    ]
    dist = sorted((r["label"], r["count"]) for r in df.groupBy("label").count().collect())
    assert dist == [("de", 76), ("en", 190), ("es", 79), ("fr", 79), ("zh", 76)]


def test_ann_ivfpq_golden(spark, sf_dir):
    if "sf0.001" not in sf_dir:
        pytest.skip("goldens pinned for sf0.001")
    df = QUERIES["ann_ivfpq_topk"].fn(spark, sf_dir)
    assert df.count() == 80  # 8 queries × k=10
    q0 = [(r["vec_id"], r["score"], r["rank"])
          for r in df.where("query_id = 0 AND rank <= 3").collect()]
    # round-8 gate config = the lossless parity regime, so the golden IS
    # the exact inner-product top-3 — re-derived independently in DuckDB
    # (brute-force list_reduce over the same parquet); the old golden
    # pinned the lossy m=8/ksub=16/nprobe=4 shape's approximate ranking
    assert [(v, rk) for v, _, rk in q0] == [(17, 1), (225, 2), (12, 3)]
    assert [sc for _, sc, _ in q0] == approx([0.334456, 0.315127, 0.311027], abs=1e-6)
