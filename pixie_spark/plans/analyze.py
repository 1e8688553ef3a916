"""Per-operator runtime execution stats — the ``analyze=true`` parity
surface.

The reference collects per-exec-node stats when a query runs with
``analyze=true`` (``/root/reference/src/carnot/carnot.cc:371-400``:
node_id, records_output, bytes_output, total/self execution time, extra
metrics per operator) and surfaces them to clients; it is the surator a
real operator debugging a slow query reaches for. Spark already
accumulates the same data — every physical node carries SQLMetric
accumulators (output rows, scan/agg/sort time, shuffle bytes, spill,
peak memory) — it just is not surfaced through the px API. This module
executes a frame's OWN QueryExecution and walks the executed physical
plan reading those accumulators.

Execution detail that makes the numbers real: ``df.write.format("noop")``
or ``df.count()`` would build a NEW QueryExecution whose fresh metric
accumulators never tick for the plan object we can reach from ``df``;
instead the plan is driven via ``queryExecution().toRdd().count()`` —
the same physical plan instance executes (fully distributed; only
per-partition counts return to the driver), so reading each node's
``metrics()`` afterwards sees the accumulated values. Under AQE the
root is an ``AdaptiveSparkPlanExec``; the walk descends through its
final plan, query-stage wrappers, and reused exchanges/subqueries,
deduping by SparkPlan id so a reused stage reports once.

The stats table itself is bounded by plan size (tens of rows), so it is
returned as a local-built DataFrame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Row

# metricType → milliseconds normalizer (SQLMetrics.scala: "timing" is
# accumulated in ms, "nsTiming" in ns; everything else is not a time)
_TIME_TYPES = {"timing": 1.0, "nsTiming": 1e-6}

ANALYZE_SCHEMA = (
    "node_id long, node string, depth int, rows_out long, time_ms double, "
    "bytes_out long, shuffle_bytes long, peak_mem_bytes long, "
    "spill_bytes long, metrics map<string,long>"
)


def _node_metrics(jnode) -> dict[str, tuple[str, int]]:
    """Read a SparkPlan node's SQLMetric map → {key: (metricType, value)}."""
    out: dict[str, tuple[str, int]] = {}
    it = jnode.metrics().iterator()
    while it.hasNext():
        kv = it.next()
        sm = kv._2()
        out[kv._1()] = (sm.metricType(), sm.value())
    return out


def _walk(jnode, depth: int, seen: set[int], rows: list[Row]) -> None:
    cls = jnode.getClass().getSimpleName()
    # wrappers: descend without emitting a row of their own
    if cls == "AdaptiveSparkPlanExec":
        _walk(jnode.executedPlan(), depth, seen, rows)
        return
    if "QueryStageExec" in cls:  # Shuffle/Broadcast/ResultQueryStageExec
        _walk(jnode.plan(), depth, seen, rows)
        return
    if cls in ("ReusedExchangeExec", "ReusedSubqueryExec"):
        _walk(jnode.child(), depth, seen, rows)
        return
    nid = jnode.id()
    if nid in seen:  # a reused stage reports once
        return
    seen.add(nid)
    if cls not in ("InputAdapter", "WholeStageCodegenExec", "ColumnarToRowExec"):
        mets = _node_metrics(jnode)
        time_ms = sum(
            v * _TIME_TYPES[t] for t, v in mets.values() if t in _TIME_TYPES
        )
        raw = {k: int(v) for k, (_t, v) in mets.items()}
        rows.append(
            Row(
                node_id=int(nid),
                node=str(jnode.nodeName()),
                depth=depth,
                rows_out=raw.get("numOutputRows"),
                time_ms=float(time_ms),
                bytes_out=raw.get("dataSize"),
                shuffle_bytes=raw.get("shuffleBytesWritten"),
                peak_mem_bytes=raw.get("peakMemory"),
                spill_bytes=raw.get("spillSize"),
                metrics=raw,
            )
        )
        depth += 1
    ch = jnode.children()
    for i in range(ch.size()):
        _walk(ch.apply(i), depth, seen, rows)
    # uncorrelated scalar subqueries (e.g. a broadcast 1-row aggregate)
    # hang off expressions, not children
    try:
        sq = jnode.subqueries()
        for i in range(sq.size()):
            _walk(sq.apply(i), depth, seen, rows)
    except Exception:
        pass  # not every node exposes subqueries()


def analyze(df: DataFrame) -> DataFrame:
    """Execute ``df`` and return per-operator runtime stats.

    Columns mirror the reference's OperatorExecutionStats
    (``carnot.cc:386-395``): ``node_id`` / ``node`` identify the
    physical operator (depth = position in the executed tree),
    ``rows_out`` = records_output, ``time_ms`` = the node's timing
    metrics total (scan/agg/sort/build time — self-time analogue),
    ``bytes_out`` / ``shuffle_bytes`` / ``peak_mem_bytes`` /
    ``spill_bytes`` the sizing metrics, and ``metrics`` the full raw
    SQLMetric map (extra_metrics analogue).

    Runs ONE distributed pass of the frame's own physical plan (no
    driver collection of the data itself); the returned stats frame is
    plan-sized. Streaming frames have no one-shot execution to measure
    — use the streaming query's progress API instead.
    """
    if df.isStreaming:
        raise ValueError(
            "analyze() executes a batch plan; a streaming frame has no "
            "one-shot execution — read lastProgress on the streaming query"
        )
    jqe = df._jdf.queryExecution()
    jqe.toRdd().count()  # execute THIS plan instance; metrics accumulate
    rows: list[Row] = []
    _walk(jqe.executedPlan(), 0, set(), rows)
    return df.sparkSession.createDataFrame(rows, ANALYZE_SCHEMA)


EXEC_SUMMARY_SCHEMA = (
    "rows_processed long, bytes_processed long, rows_output long, "
    "wall_ms double, n_scans int"
)


def exec_summary(df: DataFrame) -> DataFrame:
    """The BASIC exec stats the reference attaches to every query result
    even when analyze=false (``carnot.cc:455-462``: rows_processed /
    bytes_processed per agent, plus the result row count): one row of
    (rows_processed, bytes_processed, rows_output, wall_ms, n_scans).

    rows_processed / bytes_processed sum the source nodes' output-row
    and files-read-size metrics (file scans report bytes; in-memory
    sources — Range, LocalTableScan, InMemoryTableScan — count toward
    rows and n_scans with 0 bytes); rows_output is the EXECUTED result
    cardinality (the count the execution itself returned — a
    limit-rooted plan reports its limit, not a child node's metric).
    Executes the frame once, like :func:`analyze`."""
    import time

    if df.isStreaming:
        raise ValueError("exec_summary() executes a batch plan")
    jqe = df._jdf.queryExecution()
    t0 = time.time()
    n_out = jqe.toRdd().count()
    wall_ms = round((time.time() - t0) * 1000, 1)
    rows: list[Row] = []
    _walk(jqe.executedPlan(), 0, set(), rows)
    scans = [
        r
        for r in rows
        if r.node.startswith("Scan")  # file scans + Scan ExistingRDD
        or r.node in ("Range", "LocalTableScan", "InMemoryTableScan")
    ]
    return df.sparkSession.createDataFrame(
        [
            (
                sum(s.rows_out or 0 for s in scans),
                sum(s.metrics.get("filesSize") or 0 for s in scans),
                int(n_out),
                wall_ms,
                len(scans),
            )
        ],
        EXEC_SUMMARY_SCHEMA,
    )
