"""Multi-resolution rollup cascade (operators/rollup): the core
invariant is that every CASCADED level (computed from the finer level's
partials, raw untouched) exactly equals the same aggregation computed
directly from raw rows — checked against an independent DuckDB oracle
at each resolution — plus nesting validation and the long-format view."""

import duckdb
import pytest
from pyspark.sql import functions as F

from pixie_spark.operators.rollup import (
    cascade_long,
    finalize,
    rollup_base,
    rollup_cascade,
)
from pixie_spark.sources import load_table

WIDTHS = [60 * 10**9, 600 * 10**9, 3600 * 10**9]  # 1m → 10m → 1h


@pytest.fixture(scope="module")
def levels(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return rollup_cascade(ev, "ts", "value", ["event_type"], WIDTHS)


def _oracle(sf_dir, width_ns):
    width_us = width_ns // 1000
    return duckdb.sql(
        f"""
        SELECT event_type,
               (epoch_us(ts) // {width_us}) * {width_us} * 1000 AS bucket_ts,
               count(value) AS n, sum(value) AS sum_v,
               min(value) AS min_v, max(value) AS max_v
        FROM '{sf_dir}/events.parquet'
        GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).fetchall()


def test_every_cascaded_level_equals_direct_from_raw(spark, sf_dir, levels):
    for w in WIDTHS:
        got = {
            (r.event_type, r.bucket_ts): (r.n, r.sum_v, r.min_v, r.max_v)
            for r in levels[w].collect()
        }
        expect = {(t, b): (n, s, lo, hi) for t, b, n, s, lo, hi in _oracle(sf_dir, w)}
        assert set(got) == set(expect), f"bucket keys differ at width {w}"
        for k, (n, s, lo, hi) in expect.items():
            gn, gs, glo, ghi = got[k]
            assert gn == n and glo == lo and ghi == hi, (w, k)
            assert gs == pytest.approx(s, rel=1e-12), (w, k)


def test_finalize_avg(levels):
    row = finalize(levels[WIDTHS[0]]).first()
    assert row.avg_v == pytest.approx(row.sum_v / row.n)


def test_cascade_long_shape(levels):
    long = cascade_long(levels, ["event_type"])
    counts = {r.level_width_s: r.cnt for r in
              long.groupBy("level_width_s").agg(F.count("*").alias("cnt")).collect()}
    assert set(counts) == {60, 600, 3600}
    # coarser levels have (weakly) fewer buckets
    assert counts[60] >= counts[600] >= counts[3600]


def test_non_nesting_widths_rejected(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    with pytest.raises(ValueError, match="not a multiple"):
        rollup_cascade(ev, "ts", "value", [], [60 * 10**9, 90 * 10**9])
    with pytest.raises(ValueError, match="ascending"):
        rollup_cascade(ev, "ts", "value", [], [600 * 10**9, 60 * 10**9])


def test_base_level_only_scan_touches_raw(spark, sf_dir):
    """The coarser levels' plans read from the checkpointed finer level,
    not the parquet source — the raw table is scanned once per cascade."""
    ev = load_table(spark, sf_dir, "events")
    levels = rollup_cascade(ev, "ts", "value", ["event_type"], WIDTHS)
    plan = levels[WIDTHS[-1]]._jdf.queryExecution().executedPlan().toString()
    assert "Scan ExistingRDD" in plan or "Scan rdd" in plan.lower()
    assert "parquet" not in plan.lower()
