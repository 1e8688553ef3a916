"""The ``px`` module surface (import pixie_spark.api as px).

Reference: src/carnot/planner/objects/pixie_module.h:49-330 — DataFrame,
display, export, debug, now/seconds/minutes/hours/days, strptime,
parse_duration, equals_any, make_upid, uint128, script_reference.

Usage:

    import pixie_spark.api as px
    px.set_context(spark, tables={'http_events': http_df}, metadata=resolver)
    df = px.DataFrame('http_events', start_time='-5m')
    df.failure = df.resp_status >= 400
    stats = df.groupby(['req_path']).agg(
        count=('latency', 'px.count'),
        p99=('latency', lambda c: F.percentile_approx(c, 0.99)),
    )
    px.display(stats, 'path_stats')
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column
from pyspark.sql import DataFrame as SparkDataFrame
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from pixie_spark.api.dataframe import PxDataFrame, PxGroupedFrame
from pixie_spark.api.timemod import (
    days,
    hours,
    millis,
    minutes,
    now,
    parse_duration,
    resolve_time,
    seconds,
    strptime,
)
from pixie_spark.functions.json_ops import script_reference
from pixie_spark.types import make_upid

_ctx: dict[str, Any] = {"spark": None, "tables": {}, "metadata": None, "results": {}, "limit": 10_000}


def set_context(
    spark: SparkSession,
    tables: dict[str, SparkDataFrame] | None = None,
    metadata=None,
    display_limit: int = 10_000,
) -> None:
    """Bind the session, the table map (the reference's TableStore), and
    the k8s metadata resolver used by df.ctx[...]."""
    _ctx["spark"] = spark
    _ctx["tables"] = dict(tables or {})
    _ctx["metadata"] = metadata
    _ctx["limit"] = display_limit
    _ctx["results"] = {}


def register_table(name: str, df: SparkDataFrame) -> None:
    _ctx["tables"][name] = df


def _get_metadata_resolver():
    r = _ctx["metadata"]
    if r is None:
        raise RuntimeError("no metadata resolver bound; px.set_context(..., metadata=...)")
    return r


def DataFrame(  # noqa: N802 — PxL name
    table: str,
    select: list[str] | None = None,
    start_time=None,
    end_time=None,
) -> PxDataFrame:
    """px.DataFrame(table, select, start_time, end_time)
    (ref: objects/dataframe.h:68-117). Time range filters on the ns
    ``time_`` column — pushed to the source scan by Catalyst, the
    declarative form of the reference's time-range scan cursor
    (memory_source_node.cc:58-88)."""
    if table not in _ctx["tables"]:
        raise KeyError(f"table {table!r} not registered; have {sorted(_ctx['tables'])}")
    sdf = _ctx["tables"][table]
    ref_now = now()
    if start_time is not None:
        sdf = sdf.where(F.col("time_") >= F.lit(resolve_time(start_time, ref_now)))
    if end_time is not None:
        sdf = sdf.where(F.col("time_") < F.lit(resolve_time(end_time, ref_now)))
    if select:
        sdf = sdf.select(*select)
    return PxDataFrame(sdf)


def from_spark(sdf: SparkDataFrame) -> PxDataFrame:
    return PxDataFrame(sdf)


def run_script(code: str) -> dict[str, SparkDataFrame]:
    """Execute a PxL-flavored Python script string against the bound
    context and return its named results — the ExecuteScript entry point
    (ref: query broker QueryExecutorImpl.Run,
    src/vizier/services/query_broker/controllers/query_executor.go:167;
    our 'compiler' is the Python interpreter + this module, Catalyst
    replaces the logical planner).

    The script sees ``px`` (this module) and ``F`` (pyspark functions);
    results are whatever it passed to ``px.display``.
    """
    import pixie_spark.api as px_module

    _ctx["results"] = {}
    exec(compile(code, "<pxl_script>", "exec"), {"px": px_module, "F": F})  # noqa: S102
    return results()


def get_agent_status() -> SparkDataFrame:
    """px.GetAgentStatus() UDTF equivalent (ref: registrations
    src/vizier/funcs/md_udtfs/md_udtfs.cc): one row per executor with
    liveness info, generated driver-side from the scheduler's view."""
    spark = _ctx["spark"]
    if spark is None:
        raise RuntimeError("px.set_context(spark, ...) first")
    sc = spark.sparkContext
    rows = []
    try:  # executor memory map via the JVM scheduler (not in the Py API)
        mem_status = sc._jsc.sc().getExecutorMemoryStatus()  # noqa: SLF001
        it = mem_status.iterator()
        while it.hasNext():
            entry = it.next()
            addr = entry._1()
            mem = entry._2()
            rows.append((str(addr), int(mem._1()), int(mem._2())))
    except Exception:  # noqa: BLE001 — fall back to driver-only view
        rows = [("driver", 0, 0)]
    return spark.createDataFrame(
        rows, "executor: string, max_memory_bytes: long, free_memory_bytes: long"
    ).withColumn("total_cores", F.lit(sc.defaultParallelism))


def sql(query: str) -> PxDataFrame:
    """SQL entry over the registered tables — a surface the reference
    lacks entirely (PxL only, SURVEY §2.3); Catalyst produces the same
    plans either way."""
    spark = _ctx["spark"]
    if spark is None:
        raise RuntimeError("px.set_context(spark, ...) first")
    for name, df in _ctx["tables"].items():
        df.createOrReplaceTempView(name)
    return PxDataFrame(spark.sql(query))


def display(df: PxDataFrame, name: str = "output") -> SparkDataFrame:
    """px.display (pixie_module.h:49): register a named result.

    Batch frames get the implicit row cap the reference's analyzer adds
    (add_limit_to_batch_result_sink_rule.h). A genuinely streaming frame
    is started into an in-memory sink (GRPCSink→query-broker result
    table equivalent) and the queryable table is registered as the
    result; the handle is kept in ``streams()`` for stop/await."""
    sdf = df.to_spark() if isinstance(df, PxDataFrame) else df
    # re-display under a name bound to an active stream: stop and unbind
    # the old query first, whether the new frame is batch or streaming
    prior = _ctx.get("streams", {}).pop(name, None)
    if prior is not None:
        try:
            prior.stop()
        except Exception:  # noqa: BLE001 — already stopped
            pass
    if sdf.isStreaming:
        from pixie_spark.streaming import display_stream

        query = display_stream(sdf, name)
        _ctx.setdefault("streams", {})[name] = query
        result = _ctx["spark"].table(name)
        _ctx["results"][name] = result
        return result
    if not getattr(df, "_streaming", False):
        sdf = sdf.limit(_ctx["limit"])
    _ctx["results"][name] = sdf
    return sdf


def streams() -> dict:
    """Active streaming display queries (name → StreamingQuery)."""
    return dict(_ctx.get("streams", {}))


def results() -> dict[str, SparkDataFrame]:
    return dict(_ctx["results"])


def debug(df: PxDataFrame) -> str:
    """px.debug → the optimized/physical plan (explain passthrough)."""
    import contextlib
    import io

    sdf = df.to_spark() if isinstance(df, PxDataFrame) else df
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        sdf.explain("formatted")
    return buf.getvalue()


def equals_any(col: Column, values: list) -> Column:
    """px.equals_any (pixie_module.h) → isin."""
    return col.isin(values)


def uint128(s: str) -> tuple[int, int]:
    """px.uint128('uuid-ish string') → (high, low) int pair
    (pixie_module.h; upid.h uuid representation)."""
    hexstr = s.replace("-", "")
    if len(hexstr) != 32:
        raise ValueError(f"expected 128-bit hex/uuid, got {s!r}")
    v = int(hexstr, 16)
    mask = (1 << 64) - 1
    return ((v >> 64) & mask, v & mask)


__all__ = [
    "DataFrame", "PxDataFrame", "PxGroupedFrame", "set_context",
    "register_table", "from_spark", "sql", "display", "results", "streams", "debug",
    "equals_any", "uint128", "make_upid", "script_reference",
    "now", "seconds", "minutes", "hours", "days", "millis",
    "strptime", "parse_duration",
]
