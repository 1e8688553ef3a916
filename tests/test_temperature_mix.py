"""temperature_mix / temperature_weights (operators/sampling.py):
waterfilling math vs hand-computed values, exact deterministic
selection vs a Python replica of the hash threshold, and the
distributional promise (T>1 raises tail share)."""

import pytest
from pytest import approx
from pyspark.sql import functions as F

from pixie_spark.operators.sampling import temperature_mix, temperature_weights


def test_weights_proportional_at_t1():
    """T=1: p_d identical across domains (plain downsampling)."""
    p = temperature_weights({"a": 800, "b": 150, "c": 50}, 1.0, 500)
    assert p["a"] == approx(0.5) and p["b"] == approx(0.5) and p["c"] == approx(0.5)


def test_weights_upweight_tail_at_t2():
    p = temperature_weights({"a": 800, "b": 150, "c": 50}, 2.0, 500)
    assert p["c"] > p["b"] > p["a"]
    # expected total still hits the target
    assert 800 * p["a"] + 150 * p["b"] + 50 * p["c"] == approx(500)


def test_waterfilling_caps_and_renormalizes():
    """A tiny domain saturates at p=1; its unused mass flows to the
    others so the expected total is preserved."""
    counts = {"big": 1000, "tiny": 5}
    p = temperature_weights(counts, 100.0, 600)  # near-uniform weights
    assert p["tiny"] == 1.0
    assert 1000 * p["big"] + 5 == approx(600)


def test_weights_degenerate():
    assert temperature_weights({}, 2.0, 100) == {}
    assert temperature_weights({"a": 10}, 2.0, 0) == {"a": 0.0}
    # target ≥ corpus: everything kept
    p = temperature_weights({"a": 10, "b": 20}, 2.0, 1000)
    assert p == {"a": 1.0, "b": 1.0}


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(i, "head" if i < 800 else ("mid" if i < 950 else "tail"))
            for i in range(1000)]
    return spark.createDataFrame(rows, ["doc_id", "domain"])


def test_mix_deterministic_and_matches_threshold(spark, corpus):
    """The kept set is exactly {rows: hash-uniform < p_domain} — replayed
    independently via the same expression — and identical across runs."""
    kept1 = {r["doc_id"] for r in temperature_mix(corpus, "domain", 500, 2.0).collect()}
    kept2 = {r["doc_id"] for r in temperature_mix(corpus, "domain", 500, 2.0).collect()}
    assert kept1 == kept2
    counts = {r["domain"]: r["n"]
              for r in corpus.groupBy("domain").agg(F.count("*").alias("n")).collect()}
    probs = temperature_weights(counts, 2.0, 500)
    u = (F.pmod(F.xxhash64(F.struct("doc_id", "domain"), F.lit(42)), F.lit(1 << 32))
         / F.lit(float(1 << 32)))
    expect = {
        r["doc_id"]
        for r in corpus.withColumn("u", u).collect()
        if r["u"] < probs[r["domain"]]
    }
    assert kept1 == expect


def test_mix_shifts_distribution(spark, corpus):
    """T=4 mixture: tail share well above its 5% corpus share; head
    share well below its 80%; total near the target."""
    kept = temperature_mix(corpus, "domain", 500, 4.0)
    dist = {r["domain"]: r["n"]
            for r in kept.groupBy("domain").agg(F.count("*").alias("n")).collect()}
    total = sum(dist.values())
    assert 400 < total < 600  # Bernoulli variance around 500
    assert dist.get("tail", 0) / total > 0.08
    assert dist.get("head", 0) / total < 0.75


def test_mix_no_shuffle_plan(spark, corpus):
    """Selection is a scan-attached filter: no Exchange in the plan."""
    plan = temperature_mix(corpus, "domain", 500, 2.0)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
