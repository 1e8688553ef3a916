"""Count-min sketch (operators/sketch.py): one-sided error, the exact
linearity/merge property, error bound, weighted build, and the
bounded-size/broadcast plan contracts."""

import pyspark.sql.functions as F
import pytest

from pixie_spark.operators.sketch import (
    cms_build,
    cms_error_bound,
    cms_estimate,
    cms_merge,
)


def _terms(spark, counts: dict[str, int]):
    rows = [(t,) for t, c in counts.items() for _ in range(c)]
    return spark.createDataFrame(rows, "term string")


COUNTS = {f"t{i}": i + 1 for i in range(50)} | {"hot": 400, "warm": 120}


def test_estimates_one_sided_and_bounded(spark):
    df = _terms(spark, COUNTS)
    cms = cms_build(df, "term", depth=4, width=1024)
    probes = spark.createDataFrame([(t,) for t in COUNTS], "term string")
    est = {r["term"]: r["est"] for r in cms_estimate(cms, probes, "term", 4, 1024).collect()}
    n = sum(COUNTS.values())
    bound = cms_error_bound(n, 1024)
    for t, true in COUNTS.items():
        assert est[t] >= true  # never under-counts
        assert est[t] <= true + max(bound, 1)


def test_merge_equals_build_on_union(spark):
    """CMS linearity — the property that makes per-slice sketches
    combinable: merge(build(A), build(B)) == build(A++B) cell-for-cell."""
    a = {f"a{i}": i + 1 for i in range(30)}
    b = {f"a{i}": 2 * i + 1 for i in range(15, 45)}
    da, db = _terms(spark, a), _terms(spark, b)
    merged = cms_merge(cms_build(da, "term"), cms_build(db, "term"))
    whole = cms_build(da.unionByName(db), "term")
    ma = {(r["j"], r["bucket"]): r["cnt"] for r in merged.collect()}
    wa = {(r["j"], r["bucket"]): r["cnt"] for r in whole.collect()}
    assert ma == wa


def test_weighted_build_equals_exploded(spark):
    """Feeding pre-aggregated (term, count) rows with weight_col must
    equal building from the raw one-row-per-occurrence stream."""
    pre = spark.createDataFrame(list(COUNTS.items()), "term string, c long")
    w = cms_build(pre, "term", weight_col="c")
    raw = cms_build(_terms(spark, COUNTS), "term")
    assert {tuple(r) for r in w.collect()} == {tuple(r) for r in raw.collect()}


def test_unseen_terms_estimate_small(spark):
    cms = cms_build(_terms(spark, COUNTS), "term", depth=4, width=4096)
    probes = spark.createDataFrame([(f"unseen{i}",) for i in range(20)], "term string")
    est = cms_estimate(cms, probes, "term", 4, 4096).collect()
    n = sum(COUNTS.values())
    for r in est:
        assert r["est"] <= cms_error_bound(n, 4096) + 1


def test_sketch_size_bounded(spark):
    df = _terms(spark, {f"x{i}": 1 for i in range(500)})
    cms = cms_build(df, "term", depth=3, width=64)
    assert cms.count() <= 3 * 64


def test_estimate_plan_broadcasts_sketch(spark):
    cms = cms_build(_terms(spark, COUNTS), "term")
    probes = spark.createDataFrame([("hot",)], "term string")
    plan = (
        cms_estimate(cms, probes, "term")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


def test_deterministic(spark):
    df = _terms(spark, COUNTS)
    a = sorted(tuple(r) for r in cms_build(df, "term").collect())
    b = sorted(tuple(r) for r in cms_build(df, "term").collect())
    assert a == b


def test_streaming_microbatch_cms_equals_batch(spark, tmp_path):
    """Streaming-base duality for the frequency sketch (the HLL rollup's
    duality test, frequency twin): per-microbatch CMS builds merged via
    foreachBatch accumulation equal the one-shot batch build cell-for-
    cell — CMS linearity makes the incremental ingestion path exact."""
    import pixie_spark.streaming as S
    from pyspark.sql import types as T

    schema = T.StructType([T.StructField("term", T.StringType())])
    b1 = [(t,) for t, c in list(COUNTS.items())[:30] for _ in range(c)]
    b2 = [(t,) for t, c in list(COUNTS.items())[30:] for _ in range(c)]
    src = str(tmp_path / "cms_src")
    spark.createDataFrame(b1, schema).coalesce(1).write.mode("overwrite").parquet(src)
    spark.createDataFrame(b2, schema).coalesce(1).write.mode("append").parquet(src)

    merged: list = []

    def absorb(batch_df, _epoch):
        sketch = cms_build(batch_df, "term")
        merged.append(sketch.sparkSession.createDataFrame(
            sketch.collect(), "j int, bucket long, cnt long"
        ))

    stream = S.stream_table(spark, src, schema, max_files_per_trigger=1)
    q = stream.writeStream.foreachBatch(absorb).trigger(availableNow=True).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert len(merged) >= 2  # data really arrived over multiple microbatches
    inc = {(r["j"], r["bucket"]): r["cnt"] for r in cms_merge(*merged).collect()}
    whole = cms_build(_terms(spark, COUNTS), "term")
    assert inc == {(r["j"], r["bucket"]): r["cnt"] for r in whole.collect()}


def test_hll_overlap_report_tracks_exact_sets(spark):
    """Inclusion-exclusion overlap on planted sets: estimates within a
    few percent of the exact |A|, |B|, |A∩B|, and a disjoint pair
    reports ~zero intersection."""
    a = spark.range(0, 3000).select(F.concat(F.lit("u"), "id").alias("u"))
    b = spark.range(2000, 6000).select(F.concat(F.lit("u"), "id").alias("u"))
    from pixie_spark.operators.sketch import hll_overlap_report

    rep = hll_overlap_report(a, b, "u").collect()[0]
    assert rep["n_a"] == pytest.approx(3000, rel=0.05)
    assert rep["n_b"] == pytest.approx(4000, rel=0.05)
    assert rep["n_union"] == pytest.approx(6000, rel=0.05)
    assert rep["n_intersection"] == pytest.approx(1000, rel=0.25)
    assert rep["jaccard"] == pytest.approx(1000 / 6000, rel=0.3)

    disjoint = spark.range(100000, 103000).select(F.concat(F.lit("u"), "id").alias("u"))
    rep2 = hll_overlap_report(a, disjoint, "u").collect()[0]
    assert rep2["n_intersection"] <= 0.05 * rep2["n_union"]


def test_hll_overlap_no_join_of_the_two_sides(spark):
    """The point: the two corpora never join — the plan has no join of
    wide data, only 1-row sketch frames combining."""
    from pixie_spark.operators.sketch import hll_overlap_report

    a = spark.range(100).select(F.concat(F.lit("u"), "id").alias("u"))
    b = spark.range(100).select(F.concat(F.lit("v"), "id").alias("u"))
    plan = hll_overlap_report(a, b, "u")._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
