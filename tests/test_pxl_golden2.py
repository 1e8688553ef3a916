"""Golden-VALUE assertions, part 2: the 25 corpus scripts not covered by
test_pxl_golden.py — completing value-pinning for all 67 shipped scripts.

Same contract as part 1 (the reference's carnot_test.cc style,
src/carnot/carnot_test.cc:97-1103): every pinned number was captured from
the seeded deterministic fixtures; integers and strings compare exactly,
doubles via approx(rel=1e-9). Where a table is legitimately empty on the
fixtures (no X-Request-Id header, no registered tracepoints, no java
processes), the EMPTINESS is the golden value — pinned as count == 0 so
a regression that starts fabricating rows fails loudly.

Live-host fields (hostname) are never pinned, per the part-1 convention.
"""

import os

import pytest
from pytest import approx
from pyspark.sql import functions as F

import pixie_spark.api as px
from pixie_spark.sources.fixtures import BASE_NS, HOUR_NS, observability_context

REF = "/root/reference/src/pxl_scripts/px"
PXVIEWS = "/root/reference/src/carnot/planner/pxl_lib/pxviews.pxl"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference corpus checkout not present"
)

# fixtures' process_stats/network_stats samples live in the first ~390 s;
# scripts with '-30s'/'-300s' windows pin 'now' inside that span
T390 = BASE_NS + 390 * 1_000_000_000


def _read(rel: str) -> str:
    with open(os.path.join(REF, rel)) as f:
        return f.read()


def _read_pxviews() -> str:
    text = open(PXVIEWS).read()
    return text[text.index('R"(') + 3 : text.rindex(')"')]


@pytest.fixture(scope="module")
def ctx(spark):
    tables, resolver = observability_context(spark)
    px.set_context(spark, tables=tables, metadata=resolver)
    px.register_module("pxviews", _read_pxviews())
    px.set_now(BASE_NS + HOUR_NS)
    yield
    px.set_now(None)


def _run(rel: str, calls=None, now=None) -> dict:
    if now is not None:
        px.set_now(now)
    try:
        return px.run_script(_read(rel), calls=calls)
    finally:
        px.set_now(BASE_NS + HOUR_NS)


def _rows(df, *cols):
    sel = df.select(*cols) if cols else df
    return sorted(tuple(r) for r in sel.collect())


def _flow_args(fn_extra=None):
    return {"start_time": "-1h", "ns": "prod", "source_filter": "",
            "destination_filter": "", **(fn_extra or {})}


# --- protocol stats & flow graphs -------------------------------------------


def test_cql_stats_golden(spark, ctx):
    """CQL per-pod LET: exact row count, pod set, zero error rate, exact
    p50 latency mass; histogram and command timeseries pinned."""
    pod_args = {"start_time": "-1h", "pod": "prod/"}
    out = _run("cql_stats/cql_stats.pxl",
               calls=[("pod_cql_let", pod_args), ("latency_histogram", pod_args),
                      ("cmd_timeseries", pod_args)])
    let = out["pod_cql_let"]
    assert let.count() == 208
    assert sorted(r[0] for r in let.select("k8s").distinct().collect()) == [
        "prod/api-0001", "prod/api-0004", "prod/api-0007",
        "prod/frontend-0000", "prod/frontend-0003", "prod/frontend-0006",
        "prod/frontend-0009",
    ]
    tot = let.agg(F.sum("error_rate"), F.sum("latency_p50")).first()
    assert tot[0] == approx(0.0, abs=1e-12)
    assert tot[1] == approx(310060929.0, rel=1e-9)
    assert _rows(out["latency_histogram"]) == [(0, 208)]
    ts = out["cmd_timeseries"]
    assert ts.count() == 194
    assert _rows(ts.select("req_op").distinct()) == [("Query",)]
    assert ts.agg(F.sum("throughput_total")).first()[0] == 208


@pytest.mark.parametrize(
    "rel,fn,count,tp_sum,sample_edges",
    [
        ("cql_flow_graph/cql_flow_graph.pxl", "cql_flow_graph", 130, 208,
         [("prod/api-0001", "prod/frontend-0006", 3),
          ("staging/db-0008", "prod/frontend-0003", 5)]),
        ("pgsql_flow_graph/pgsql_flow_graph.pxl", "pgsql_flow_graph", 122, 210,
         [("prod/frontend-0000", "prod/api-0004", 6),
          ("staging/db-0005", "prod/frontend-0000", 6)]),
        ("redis_flow_graph/redis_flow_graph.pxl", "redis_flow_graph", 123, 212,
         [("prod/frontend-0000", "prod/frontend-0003", 6),
          ("staging/db-0002", "prod/frontend-0006", 6)]),
    ],
)
def test_protocol_flow_graph_golden(spark, ctx, rel, fn, count, tp_sum, sample_edges):
    """Flow graphs for CQL/PgSQL/Redis: exact edge counts, total request
    mass, and spot-pinned pod→pod edges."""
    out = _run(rel, calls=[(fn, _flow_args())])
    d = out[fn]
    assert d.count() == count
    assert d.agg(F.sum("throughput_total")).first()[0] == tp_sum
    pod_edges = dict()
    for src, dst, tp in _rows(
        d.where("is_dest_pod_type").select("source", "destination", "throughput_total")
    ):
        pod_edges[(src, dst)] = tp
    for src, dst, tp in sample_edges:
        assert pod_edges[(src, dst)] == tp


def test_redis_data_golden(spark, ctx):
    """Raw Redis events head: exact row count and per-command breakdown."""
    out = _run("redis_data/redis_data.pxl",
               calls=[("redis_data", {"start_time": "-1h", "source_filter": "",
                                      "destination_filter": "", "num_head": 100})])
    d = out["redis_data"]
    assert d.count() == 100
    assert _rows(d.groupBy("req_cmd").count()) == [
        ("EXPIRE", 19), ("GET", 19), ("HGET", 17), ("INCR", 21), ("SET", 24),
    ]


def test_http_trace_id_golden(spark, ctx):
    """No fixture request carries an X-Request-Id header — the golden
    result is exactly zero rows (not an error, not fabricated rows)."""
    out = _run("http_trace_id/script.pxl",
               calls=[("http_trace_data",
                       {"start_time": "-1h", "trace_header_name": "X-Request-Id",
                        "trace_id_filter": ""})])
    d = out["http_trace_data"]
    assert d.count() == 0
    assert "trace_id" in d.columns and "req_path" in d.columns


def test_ip_golden(spark, ctx):
    """All four ip.pxl views pinned exactly for 10.0.0.2 (prod/api-0001):
    resolution to pod/service/node plus byte-rate symmetry between the
    pod_traffic and net_flow_graph views."""
    args = {"start_time": "-1h", "ip": "10.0.0.2"}
    out = _run("ip/ip.pxl",
               calls=[("ip_info", args), ("pod_traffic_to_ip", args),
                      ("net_flow_graph", args), ("traffic_involving_ip", args)])
    (info,) = out["ip_info"].collect()
    assert (info["ip_pod"], info["ip_service"], info["ip_node"]) == (
        "prod/api-0001", "prod/api", "node-2")
    assert info["bytes_per_s_from_ip"] == approx(1.5676932203389832e-06, rel=1e-9)
    assert info["bytes_per_s_to_ip"] == approx(7.223372881355932e-07, rel=1e-9)
    traffic = _rows(out["pod_traffic_to_ip"])
    assert [t[0] for t in traffic] == ["prod/api-0001", "prod/frontend-0000"]
    assert traffic[0][1:] == approx(
        (1.1258966101694916e-06, 4.819796610169491e-07, 1.6078762711864407e-06), rel=1e-9)
    assert traffic[1][1:] == approx(
        (4.4179661016949154e-07, 2.4035762711864405e-07, 6.821542372881356e-07), rel=1e-9)
    flow = _rows(out["net_flow_graph"])
    # the ip is the requestor toward api-0001, the responder from frontend
    assert [(f[0], f[1]) for f in flow] == [
        ("10.0.0.2", "prod/api-0001"), ("prod/frontend-0000", "10.0.0.2")]
    # totals agree across the two views of the same traffic
    assert flow[0][4] == approx(traffic[0][3], rel=1e-9)
    assert flow[1][4] == approx(traffic[1][3], rel=1e-9)
    inv = _rows(out["traffic_involving_ip"],
                "pod", "node", "service", "trace_role", "bytes_sent_by_pod",
                "bytes_recv_by_pod", "total_bytes")
    assert inv == [
        ("prod/api-0001", "node-2", "prod/api", 2, 284368, 664279, 948647),
        ("prod/frontend-0000", "node-1", "prod/frontend", 1, 141811, 260660, 402471),
    ]


def test_kafka_consumer_rebalancing_golden(spark, ctx):
    """JoinGroup/SyncGroup correlation: one consumer group with 14
    members, 42 join/sync events, 41 correlated delays, exact delay mass."""
    out = _run(
        "kafka_consumer_rebalancing/kafka_consumer_rebalancing.pxl",
        calls=[("kafka_join_sync_group_events", {"start_time": "-1h", "consumer_group_id": ""}),
               ("kafka_group_ids", {"start_time": "-1h"}),
               ("kafka_join_sync_delay", {"start_time": "-1h", "consumer_group_id": ""})])
    assert _rows(out["kafka_group_ids"]) == [("cg-1", 14)]
    assert out["kafka_join_sync_group_events"].count() == 42
    d = out["kafka_join_sync_delay"]
    assert d.count() == 41
    lo, hi, tot = d.agg(F.min("delay"), F.max("delay"), F.sum("delay")).first()
    assert (lo, hi, tot) == (0, 2367050419938, 10882594359354)


def test_kafka_producer_consumer_latency_golden(spark, ctx):
    out = _run("kafka_producer_consumer_latency/kafka_producer_consumer_latency.pxl",
               calls=[("kafka_topics", {"start_time": "-1h", "namespace": "prod"})])
    assert sorted(r[0] for r in out["kafka_topics"].collect()) == [
        "events", "logs", "orders"]


# --- resource usage ----------------------------------------------------------


def test_network_stats_golden(spark, ctx):
    """Per-pod network counters over the '-30s' window: exact totals."""
    out = _run("network_stats/stats.pxl", now=T390)
    d = out["output"]
    assert d.count() == 40
    assert d.select("pod_id").distinct().count() == 10
    assert tuple(d.agg(F.sum("rx_bytes"), F.sum("tx_bytes"),
                       F.sum("rx_packets"), F.sum("tx_packets")).first()) == (
        749778993, 409758210, 749173, 618934)


def test_pid_memory_usage_golden(spark, ctx):
    out = _run("pid_memory_usage/usage.pxl", now=T390)
    d = out["output"]
    assert d.count() == 40
    assert d.agg(F.sum("Virtual Memory")).first()[0] == approx(51902479772.0, rel=1e-9)


def test_pod_memory_usage_golden(spark, ctx):
    out = _run("pod_memory_usage/pod.pxl", now=T390)
    d = out["output"]
    assert d.count() == 70
    assert d.select("pod").distinct().count() == 10
    assert d.agg(F.sum("Virtual Memory")).first()[0] == approx(87023296421.0, rel=1e-9)


def test_pod_lifetime_resource_golden(spark, ctx):
    """Whole-lifetime resource rollup: one row per pod with exact status,
    mean virtual memory, and total characters read."""
    out = _run("pod_lifetime_resource/resource.pxl", now=T390)
    got = _rows(out["output"], "pod_name", "status", "Virtual Memory", "Characters Read")
    expected = [
        ("prod/api-0001", "Running", 1301689740.2857144, 26680432),
        ("prod/api-0004", "Running", 1208281097.7142856, 23879078),
        ("prod/api-0007", "Pending", 1507565029.7142856, 23217672),
        ("prod/frontend-0000", "Pending", 1455694749.142857, 18630608),
        ("prod/frontend-0003", "Running", 1171135923.5714285, 21526857),
        ("prod/frontend-0006", "Running", 965605739.4285715, 20824613),
        ("prod/frontend-0009", "Running", 1005070415.2857143, 21874491),
        ("staging/db-0002", "Running", 1171235279.5714285, 21831417),
        ("staging/db-0005", "Running", 1146921376.0, 22746618),
        ("staging/db-0008", "Running", 1498700138.0, 20174014),
    ]
    assert [(g[0], g[1], g[3]) for g in got] == [(e[0], e[1], e[3]) for e in expected]
    assert [g[2] for g in got] == approx([e[2] for e in expected], rel=1e-9)


def test_service_resource_usage_golden(spark, ctx):
    """Per-service rollup: pod counts exact, cpu/rss averages and the
    latency-quantile struct pinned."""
    out = _run("service_resource_usage/usage.pxl",
               calls=[("services_for_cluster", {"start_time": "-1h"})])
    rows = {r["service"]: r for r in out["services_for_cluster"].collect()}
    assert {s: rows[s]["pod_count"] for s in rows} == {
        "prod/api": 3, "prod/frontend": 4, "staging/db": 3}
    assert rows["prod/api"]["avg_pod_cpu"] == approx(0.030953263205128204, rel=1e-9)
    assert rows["prod/frontend"]["avg_pod_rss"] == approx(296695321.875, rel=1e-9)
    assert rows["staging/db"]["http_latency"]["p50"] == 1886023
    assert rows["prod/frontend"]["http_latency"]["p99"] == 24848896


# --- service / sql stats -----------------------------------------------------


def test_service_stats_golden(spark, ctx):
    """prod/frontend service LET + code and latency histograms, exact."""
    sargs = {"start_time": "-1h", "svc": "prod/frontend"}
    out = _run("service_stats/service_stats.pxl",
               calls=[("svc_let", sargs), ("http_code_histogram", sargs),
                      ("latency_histogram", sargs)])
    let = out["svc_let"]
    assert let.count() == 278
    assert _rows(let.select("k8s").distinct()) == [("prod/frontend",)]
    assert let.agg(F.sum("error_rate")).first()[0] == approx(4.5e-09, rel=1e-6)
    assert _rows(out["http_code_histogram"]) == [
        (200, 583), (204, 112), (400, 17), (404, 17), (500, 11)]
    assert _rows(out["latency_histogram"]) == [
        (0, 737), (50000000, 2), (200000000, 1)]


def test_sql_query_golden(spark, ctx):
    """Single normalized-query drilldown: every row carries the requested
    query, exact row count and p50 latency mass."""
    out = _run("sql_query/normed_sql_query.pxl",
               calls=[("pod_sql_let",
                       {"start_time": "-1h", "pod": "prod/",
                        "normed_query": "SELECT COUNT(*) FROM lineitem"})])
    d = out["pod_sql_let"]
    assert d.count() == 76
    assert _rows(d.select("normed_query").distinct()) == [
        ("SELECT COUNT(*) FROM lineitem",)]
    assert d.agg(F.sum("latency_p50")).first()[0] == approx(78841470, rel=1e-9)


# --- platform diagnostics ----------------------------------------------------


def test_stirling_errors_golden(spark, ctx):
    """Stirling error log + probe status: exact per-connector/status
    breakdowns."""
    out = _run("stirling_errors/stirling_errors.pxl",
               calls=[("stirling_error",
                       {"start_time": "-1h", "source_connector_filter": "", "num_head": 100}),
                      ("probe_status",
                       {"start_time": "-1h", "tracepoint_filter": "", "num_head": 100})])
    err = out["stirling_error"]
    assert err.count() == 60
    assert _rows(err.groupBy("source_connector", "status").count()) == [
        ("jvm_stats", 0, 15), ("jvm_stats", 13, 3),
        ("perf_profiler", 0, 15), ("perf_profiler", 13, 3),
        ("process_stats", 0, 8), ("process_stats", 13, 2),
        ("socket_tracer", 0, 12), ("socket_tracer", 13, 2),
    ]
    probe = out["probe_status"]
    assert probe.count() == 60
    assert _rows(probe.groupBy("status").count()) == [(0, 50), (2, 10)]


def test_tracepoint_status_golden(spark, ctx):
    """No dynamic tracepoints are registered on the fixture cluster — both
    views are exactly empty with the full schema."""
    out = _run("tracepoint_status/tracepoint_status.pxl",
               calls=[("tracepoint_info", {}), ("running_tracepoints", {})])
    for name in ("tracepoint_info", "running_tracepoints"):
        d = out[name]
        assert d.count() == 0
        assert {"tracepoint_id", "name", "state", "status", "output_tables"} <= set(d.columns)


def test_upids_golden(spark, ctx):
    """UPID listing for prod: exact pod/container/cmdline triples."""
    out = _run("upids/upids.pxl",
               calls=[("upids_for_namespace", {"start_time": "-1h", "namespace": "prod"})])
    assert _rows(out["upids_for_namespace"], "pod", "container", "cmdline") == [
        ("prod/api-0001", "app-1", "/bin/server --port=8081"),
        ("prod/api-0004", "app-1", "/bin/server --port=8084"),
        ("prod/api-0007", "app-1", "/bin/server --port=8087"),
        ("prod/frontend-0000", "app-0", "/bin/server --port=8080"),
        ("prod/frontend-0003", "app-0", "/bin/server --port=8083"),
        ("prod/frontend-0006", "app-0", "/bin/server --port=8086"),
        ("prod/frontend-0009", "app-0", "/bin/server --port=8089"),
    ]


def test_schemas_golden(spark, ctx):
    """GetSchemas catalog: exact table list and per-table column counts
    (the reference's compiled-in relations, schemas.pxl)."""
    out = _run("schemas/schemas.pxl", calls=[("table_desc", {}), ("table_schema", {})])
    assert sorted(r[0] for r in out["table_desc"].select("table_name").collect()) == [
        "amqp_events", "conn_stats", "cql_events", "dns_events", "http_events",
        "jvm_stats", "k8s_containers", "k8s_deployments", "k8s_pods",
        "k8s_replicasets", "k8s_services", "kafka_events.beta", "mongodb_events",
        "mux_events", "mysql_events", "nats_events.beta", "network_stats",
        "pgsql_events", "probe_status", "process_stats", "redis_events",
        "stack_traces.beta", "stirling_error",
    ]
    counts = dict(_rows(out["table_schema"].groupBy("table_name").count()))
    assert counts["http_events"] == 22
    assert counts["conn_stats"] == 13
    assert counts["k8s_pods"] == 12
    assert counts["stack_traces.beta"] == 5
    assert sum(counts.values()) == 244


def test_funcs_golden(spark, ctx):
    """Registry listings: exact UDA set and UDTF set, map-func count."""
    out = _run("funcs/funcs.pxl",
               calls=[("map_funcs", {}), ("agg_funcs", {}), ("table_funcs", {})])
    assert out["map_funcs"].count() == 79
    assert sorted(r[0] for r in out["agg_funcs"].select("name").collect()) == [
        "any", "count", "max", "mean", "min", "pprof", "quantiles",
        "quantiles_json", "sum"]
    assert sorted(r[0] for r in out["table_funcs"].select("name").collect()) == [
        "GetAgentStatus", "GetCronScriptHistory", "GetLinuxHeadersStatus",
        "GetProfilerSamplingPeriodMS", "GetSchemas", "GetTables",
        "GetTracepointStatus", "GetUDAList", "GetUDFList", "GetUDTFList",
        "_DebugMDGetWithPrefix", "_DebugTableInfo"]


def test_differential_flamegraph_golden(spark, ctx):
    """Differential profile frontend-0000 vs api-0001: exact stack count,
    total sample mass, total delta, and the hottest shared stack."""
    out = _run("differential_flamegraph/differential.pxl",
               calls=[("differential_flamegraph",
                       {"start_time": "-1h", "namespace": "prod",
                        "pod": "prod/frontend-0000", "baseline_pod": "prod/api-0001"})])
    d = out["differential_flamegraph"]
    assert d.count() == 48
    tot = d.agg(F.sum("count"), F.sum("delta")).first()
    assert tuple(tot) == (1170, 32)
    top = {r["stack_trace"]: (r["count"], r["delta"]) for r in d.collect()}
    assert top["runtime.schedule;runtime.schedule;runtime.schedule"][0] == 49
    assert top["runtime.schedule;db.query"] == (48, 32)


def test_agent_status_diagnostics_golden(spark, ctx):
    """Linux-headers install rate across agents: fixture agents all report
    headers not installed → exactly 0.0 percent."""
    out = _run("agent_status_diagnostics/agent_status.pxl")
    assert [tuple(r) for r in out["output"].collect()] == [(0.0,)]


def test_collect_agent_heaps_golden(spark, ctx):
    """Heap pprof collection: one row for asid 0 whose folded heap dump
    starts with the JVM code-heap root (hostname is live — not pinned)."""
    out = _run("collect_agent_heaps/collect_agent_heaps.pxl",
               calls=[("collect_pprofs", {"asid": 0})])
    rows = out["collect_pprofs"].collect()
    assert sorted(r["asid"] for r in rows) == [0]
    assert all(r["heap"].startswith("jvm;CodeHeap_'non-nm") for r in rows)


def test_pixie_quality_metrics_golden(spark, ctx):
    """Self-monitoring latency sanity counts: exact huge/negative latency
    breakdown for http and mysql; no java processes on the fixtures."""
    out = _run("pixie_quality_metrics/pixie_quality_metrics.pxl", now=T390)
    assert _rows(out["http_latencies"]) == [(False, False, 1734), (True, False, 178)]
    assert _rows(out["mysql_latencies"]) == [(False, False, 285), (True, False, 5)]
    assert out["java_processes"].count() == 0
    assert out["jvm_stats"].count() == 0
