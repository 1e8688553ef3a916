"""px.debug(analyze=True) — per-operator runtime execution stats.

Parity target: the reference collects per-exec-node stats when a query
runs with analyze=true (/root/reference/src/carnot/carnot.cc:371-400 —
records_output, bytes_output, execution time per operator) and surfaces
them to clients. Here the same numbers come from Spark's SQLMetric
accumulators on the executed physical plan (pixie_spark.plans.analyze).
These tests pin the contract the verdict asked for: non-trivial
rows/time stats for a flagship-shaped query's scan, aggregate, join and
exchange nodes.
"""

import pytest
from pyspark.sql import functions as F

from pixie_spark.plans.analyze import analyze


def _flagship(spark, sf_dir):
    """A scan→filter→agg→join shape over the test tables."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    per_order = (
        li.where(F.col("l_quantity") > 0)
        .groupBy("l_orderkey")
        .agg(F.sum("l_extendedprice").alias("revenue"))
    )
    return (
        per_order.join(orders, per_order.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.sum("revenue").alias("total"))
    )


@pytest.fixture(scope="module")
def stats(spark, sf_dir):
    return {r["node_id"]: r for r in analyze(_flagship(spark, sf_dir)).collect()}


def _by_kind(stats, fragment):
    return [r for r in stats.values() if fragment in r["node"]]


def test_scan_node_has_rows_and_time(stats):
    scans = _by_kind(stats, "Scan parquet")
    assert scans, f"no scan nodes in {[r['node'] for r in stats.values()]}"
    # both tables scanned; the lineitem scan saw every row
    assert max(s["rows_out"] for s in scans) >= 6000
    assert all(s["rows_out"] > 0 for s in scans)
    assert any("scanTime" in s["metrics"] for s in scans)


def test_aggregate_node_has_rows_and_time(stats):
    aggs = _by_kind(stats, "HashAggregate")
    assert aggs
    assert any(a["rows_out"] > 0 for a in aggs)
    # aggTime is a 'timing' metric — folded into time_ms
    assert any("aggTime" in a["metrics"] for a in aggs)
    assert all(a["time_ms"] >= 0.0 for a in aggs)


def test_join_node_has_rows(stats):
    joins = [
        r
        for r in stats.values()
        if "Join" in r["node"] and "Exchange" not in r["node"]
    ]
    assert joins, f"no join nodes in {[r['node'] for r in stats.values()]}"
    assert any(j["rows_out"] > 0 for j in joins)


def test_exchange_node_reports_shuffle_bytes(stats):
    exchanges = [r for r in stats.values() if r["node"] == "Exchange"]
    assert exchanges
    assert any((e["shuffle_bytes"] or 0) > 0 for e in exchanges)
    assert any((e["metrics"].get("shuffleRecordsWritten") or 0) > 0 for e in exchanges)


def test_node_ids_unique_and_rows_bounded(spark, sf_dir):
    out = analyze(_flagship(spark, sf_dir))
    rows = out.collect()
    ids = [r["node_id"] for r in rows]
    assert len(ids) == len(set(ids))  # reused stages report once
    assert 0 < len(rows) < 200  # plan-sized, never data-sized


def test_px_debug_analyze_registers_and_returns_frame(spark, sf_dir):
    import pixie_spark.api as px

    px._ctx["results"].clear()
    stats_df = px.debug(_flagship(spark, sf_dir), "anstats", analyze=True)
    names = {f.name for f in stats_df.schema.fields}
    assert {"node_id", "node", "rows_out", "time_ms", "metrics"} <= names
    assert "_anstats" in px._ctx["results"]
    assert stats_df.where(F.col("rows_out") > 0).count() > 0


def test_exec_summary_basic_stats(spark, sf_dir):
    """The basic exec stats the reference sends even with analyze=false
    (carnot.cc:455-462): rows/bytes processed across scans + result
    cardinality in one row."""
    from pixie_spark.plans.analyze import exec_summary

    row = exec_summary(_flagship(spark, sf_dir)).collect()[0]
    assert row["n_scans"] == 2  # lineitem + orders
    assert row["rows_processed"] >= 6000 + 1500
    assert row["bytes_processed"] > 0
    assert row["rows_output"] is not None and row["rows_output"] > 0
    assert row["wall_ms"] > 0


def test_exec_summary_limit_root_and_inmemory_source(spark):
    """Two review-found edges: (1) a limit-rooted plan must report the
    LIMIT as rows_output (CollectLimitExec has no numOutputRows metric;
    a node-metric heuristic reported a child's partial count); (2)
    non-file sources (Range here) must still count toward
    rows_processed/n_scans instead of silently reporting 0."""
    from pixie_spark.plans.analyze import exec_summary

    row = exec_summary(spark.range(0, 1000).limit(5)).collect()[0]
    assert row["rows_output"] == 5
    assert row["n_scans"] == 1
    assert row["rows_processed"] > 0
    assert row["bytes_processed"] == 0  # in-memory source: no file bytes


def test_streaming_frame_rejected(spark):
    sdf = spark.readStream.format("rate").load()
    with pytest.raises(ValueError, match="streaming"):
        analyze(sdf)
