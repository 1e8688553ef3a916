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


# --- epoch_expand (data-constrained repeats) --------------------------------


def _dom_docs(spark, spec):
    rows = [
        (d * 1000 + i, f"text {d} {i}", d)
        for d, n in spec.items()
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang long")


def test_epoch_expand_counts(spark):
    from pixie_spark.operators.sampling import epoch_expand

    df = _dom_docs(spark, {1: 200, 2: 100, 3: 50})
    out = epoch_expand(df, "lang", {1: 1.0, 2: 2.5, 3: 0.4}, id_col="doc_id")
    counts = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts[1] == 200           # e=1: unchanged
    assert 230 <= counts[2] <= 270    # e=2.5: 200 full + ~50 fractional
    assert 10 <= counts[3] <= 30      # e=0.4: ~20 kept once
    # every (id, epoch) pair is unique → safe downstream shard key
    assert out.select("doc_id", "epoch").distinct().count() == out.count()


def test_epoch_expand_exact_python_replica(spark):
    """The fractional pick is a pure function of (id, seed): replicate
    the threshold decision row-for-row."""
    from pixie_spark.operators.sampling import epoch_expand

    df = _dom_docs(spark, {7: 40})
    hashes = {
        r["doc_id"]: r["u"]
        for r in df.select(
            "doc_id",
            (F.pmod(F.xxhash64("doc_id", F.lit(42)), F.lit(1 << 32)) / F.lit(float(1 << 32))).alias("u"),
        ).collect()
    }
    out = epoch_expand(df, "lang", {7: 1.3}, id_col="doc_id").collect()
    got = {}
    for r in out:
        got.setdefault(r["doc_id"], []).append(r["epoch"])
    for did, u in hashes.items():
        expect = [0, 1] if u < 0.3 else [0]
        assert sorted(got[did]) == expect


def test_epoch_expand_defaults_and_determinism(spark):
    from pixie_spark.operators.sampling import epoch_expand

    df = _dom_docs(spark, {1: 30, 2: 30})
    out = epoch_expand(df, "lang", {2: 2.0})  # lang 1 missing → e=1
    counts = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts == {1: 30, 2: 60}
    a = sorted((r["doc_id"], r["epoch"]) for r in epoch_expand(df, "lang", {1: 1.5}).collect())
    b = sorted((r["doc_id"], r["epoch"]) for r in epoch_expand(df, "lang", {1: 1.5}).collect())
    assert a == b


def test_epoch_expand_no_shuffle(spark):
    from pixie_spark.operators.sampling import epoch_expand

    df = _dom_docs(spark, {1: 10})
    plan = (
        epoch_expand(df, "lang", {1: 2.5})
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_temperature_mix_token_weighted_mass(spark):
    """weight_col switches the tempering unit from documents to tokens
    (T5 §3.4.3 samples by language SIZE): a domain with few but huge
    documents must count as a HEAD domain, not a tail one."""
    from pixie_spark.operators.sampling import temperature_mix, temperature_weights

    rows = (
        # 'big': 10 docs x 1000 tokens = 10_000 token mass
        [(f"b{i}", "big", 1000) for i in range(10)]
        # 'small': 100 docs x 10 tokens = 1_000 token mass
        + [(f"s{i}", "small", 10) for i in range(100)]
    )
    df = spark.createDataFrame(rows, "doc_id string, domain string, n_tokens long")

    kept = temperature_mix(
        df, "domain", target_total=2000, temperature=1.0, seed=1, weight_col="n_tokens"
    )
    got = {
        r["domain"]: r["m"]
        for r in kept.groupBy("domain").agg(F.sum("n_tokens").alias("m")).collect()
    }
    # at T=1 expected kept mass is proportional: ~1818 vs ~182 tokens;
    # hash noise moves individual draws, proportions must not flip
    assert got.get("big", 0) > got.get("small", 0) * 3

    # the probabilities themselves follow the token masses exactly
    probs = temperature_weights({"big": 10_000, "small": 1_000}, 1.0, 2000)
    assert abs(probs["big"] - probs["small"]) < 1e-12  # T=1 ⇒ equal p per unit
    # under strong tempering the two mass definitions DISAGREE on which
    # domain is the tail: token masses upweight 'small'…
    tok = temperature_weights({"big": 10_000, "small": 1_000}, 4.0, 2000)
    assert tok["small"] > tok["big"]
    # …while doc counts call 'big' the 10x-rarer tail and saturate it
    doc = temperature_weights({"big": 10, "small": 100}, 4.0, 50)
    assert doc["big"] == 1.0 and doc["small"] < 1.0
