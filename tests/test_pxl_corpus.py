"""VERBATIM execution of the reference's shipped PxL corpus scripts.

Each test feeds the LITERAL text of a script from the reference checkout
(/root/reference/src/pxl_scripts/px/...) through px.run_script against
the synthetic observability fixtures, then asserts the named results are
non-empty with the script's own output columns. Script text is read from
the reference AT TEST TIME (not vendored) — the scripts are the
reference's workload, like TPC-H query text, not engine code.

Function-style scripts (most of the corpus) are executed the way the
reference's UI does: vis.json names (function, args) pairs; here the
test supplies equivalent args via run_script(calls=...).

The pxviews library (src/carnot/planner/pxl_lib/pxviews.pxl, shipped
embedded in a C++ raw string) is registered as an importable module the
same way the reference preloads it.
"""

import os

import pytest
from pyspark.sql import functions as F

import pixie_spark.api as px
from pixie_spark.sources.fixtures import BASE_NS, HOUR_NS, observability_context

REF = "/root/reference/src/pxl_scripts/px"
PXVIEWS = "/root/reference/src/carnot/planner/pxl_lib/pxviews.pxl"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference corpus checkout not present"
)


def _read(rel: str) -> str:
    with open(os.path.join(REF, rel)) as f:
        return f.read()


def _read_pxviews() -> str:
    # the library ships inside a C++ raw-string literal: R"( ... )"
    text = open(PXVIEWS).read()
    start = text.index('R"(') + 3
    end = text.rindex(')"')
    return text[start:end]


@pytest.fixture(scope="module")
def ctx(spark):
    tables, resolver = observability_context(spark)
    px.set_context(spark, tables=tables, metadata=resolver)
    px.register_module("pxviews", _read_pxviews())
    # fixtures span [BASE_NS, BASE_NS + 1h); pin 'now' just past the end
    # so the scripts' relative ranges ('-30s', '-5m') select real rows
    px.set_now(BASE_NS + HOUR_NS)
    yield
    px.set_now(None)


def _run(rel: str, calls=None) -> dict:
    return px.run_script(_read(rel), calls=calls)


# --- top-level scripts (display at module scope) -----------------------------


def test_http_request_stats(spark, ctx):
    """px/http_request_stats/stats.pxl — the flagship LET script."""
    px.set_now(BASE_NS + 30 * 1_000_000_000)  # '-30s' window over fixtures
    try:
        out = _run("http_request_stats/stats.pxl")
    finally:
        px.set_now(BASE_NS + HOUR_NS)
    df = out["output"]
    assert df.count() > 0
    for c in ["service", "latency(p50)", "latency(p99)", "errors", "throughput"]:
        assert c in df.columns
    assert df.where(F.col("service").isNull()).count() == 0


def test_http_data(spark, ctx):
    out = _run(
        "http_data/data.pxl",
        calls=[("http_data", {"start_time": "-1h", "source_filter": "",
                              "destination_filter": "", "num_head": 100})],
    )
    assert out["http_data"].count() > 0


def test_most_http_data(spark, ctx):
    out = _run("most_http_data/data.pxl")  # top-level display
    assert out["max_path_pod"].count() > 0


def test_slow_http_requests(spark, ctx):
    out = _run(
        "slow_http_requests/slow_http_requests.pxl",
        calls=[("namespace_slow_requests", {"start_time": "-1h", "namespace": "prod"})],
    )
    df = out["namespace_slow_requests"]
    assert "latency" in df.columns
    df.count()  # executes the plan (p99 filter may legitimately leave few rows)


def test_dns_flow_graph(spark, ctx):
    out = _run(
        "dns_flow_graph/dns_flow_graph.pxl",
        calls=[("dns_flow_graph", {"start_time": "-1h", "from_entity_filter": "",
                                   "to_entity_filter": ""})],
    )
    assert out["dns_flow_graph"].count() > 0


def test_net_flow_graph(spark, ctx):
    out = _run(
        "net_flow_graph/net_flow_graph.pxl",
        calls=[("net_flow_graph", {"start_time": "-1h", "ns": "prod",
                                   "from_entity_filter": "", "to_entity_filter": "",
                                   "throughput_filter": 0.0})],
    )
    assert out["net_flow_graph"].count() > 0


def test_pods_pxl(spark, ctx):
    out = _run(
        "pods/pods.pxl",
        calls=[
            ("pods", {"start_time": "-1h", "namespace": "prod"}),
            ("inbound_let_timeseries", {"start_time": "-1h", "namespace": "prod"}),
        ],
    )
    assert out["pods"].count() > 0
    assert out["inbound_let_timeseries"].count() > 0


def test_services_pxl(spark, ctx):
    """px/services/services.pxl (another upstream missing-comma ship)."""
    out = _run(
        "services/services.pxl",
        calls=[("services", {"start_time": "-1h", "namespace": "prod"})],
    )
    assert out["services"].count() > 0


# --- function-style scripts (vis.json execution model) -----------------------


def test_service_pxl(spark, ctx):
    """px/service/service.pxl (ships with an upstream missing-comma bug;
    the fixup in api.pxl repairs exactly that)."""
    svc = "prod/frontend"
    out = _run(
        "service/service.pxl",
        calls=[
            ("pods_for_service", {"start_time": "-1h", "service": svc}),
            ("inbound_let_timeseries", {"start_time": "-1h", "service": svc}),
            ("let_summary_helper", {"start_time": "-1h"}),
        ],
    )
    pods = out["pods_for_service"]
    assert pods.count() > 0
    assert {"pod", "pod_create_time", "pod_status"} <= set(pods.columns)
    ts = out["inbound_let_timeseries"]
    assert ts.count() > 0
    assert {"latency_p50", "latency_p99", "request_throughput"} <= set(ts.columns)


def test_pod_pxl(spark, ctx):
    pod = "prod/frontend-0000"
    out = _run(
        "pod/pod.pxl",
        calls=[
            ("resource_timeseries", {"start_time": "-1h", "pod": pod}),
            ("inbound_latency_timeseries", {"start_time": "-1h", "pod": pod}),
        ],
    )
    rt = out["resource_timeseries"]
    assert rt.count() > 0


def test_node_pxl(spark, ctx):
    out = _run(
        "node/node.pxl",
        calls=[
            ("pods_for_node", {"start_time": "-1h", "node": "node-1"}),
            ("resource_timeseries", {"start_time": "-1h", "node": "node-1", "groupby": "pod"}),
            ("network_stats", {"start_time": "-1h", "node": "node-1", "groupby": "pod"}),
        ],
    )
    assert out["pods_for_node"].count() > 0
    assert out["resource_timeseries"].count() > 0


def test_namespace_pxl(spark, ctx):
    ns = "prod"
    out = _run(
        "namespace/namespace.pxl",
        calls=[
            ("pods_for_namespace", {"start_time": "-1h", "namespace": ns}),
        ],
    )
    pods = out["pods_for_namespace"]
    assert pods.count() > 0


def test_cluster_pxl(spark, ctx):
    out = _run(
        "cluster/cluster.pxl",
        calls=[
            ("nodes_for_cluster", {"start_time": "-1h"}),
            ("namespaces_for_cluster", {"start_time": "-1h"}),
            ("pods_for_cluster", {"start_time": "-1h"}),
        ],
    )
    assert out["nodes_for_cluster"].count() > 0
    assert out["namespaces_for_cluster"].count() > 0
    assert out["pods_for_cluster"].count() > 0


def test_network_stats_pxl(spark, ctx):
    # top-level script with a '-30s' range; pin now inside the sampled span
    px.set_now(BASE_NS + 390 * 1_000_000_000)
    try:
        out = _run("network_stats/stats.pxl")
    finally:
        px.set_now(BASE_NS + HOUR_NS)
    assert any(df.count() > 0 for df in out.values())


def test_pod_edge_stats_pxl(spark, ctx):
    out = _run(
        "pod_edge_stats/pod_edge_stats.pxl",
        calls=[
            (
                "pod_edge_let",
                {
                    "start_time": "-1h",
                    "requesting_pod": "prod/frontend-0000",
                    "responding_pod": "prod/api-0001",
                },
            )
        ],
    )
    assert out


def test_schemas_pxl(spark, ctx):
    out = _run(
        "schemas/schemas.pxl",
        calls=[("table_desc", {}), ("table_schema", {})],
    )
    tables = out["table_desc"]
    schemas = out["table_schema"]
    assert tables.count() >= 6  # every registered source table listed
    assert {"table_name", "column_name", "column_type"} <= set(schemas.columns)
    assert schemas.where(F.col("table_name") == "http_events").count() >= 20


def test_funcs_pxl(spark, ctx):
    out = _run(
        "funcs/funcs.pxl",
        calls=[("map_funcs", {}), ("agg_funcs", {}), ("table_funcs", {})],
    )
    assert out["map_funcs"].count() >= 50
    assert out["agg_funcs"].count() >= 5
    assert out["table_funcs"].count() >= 8


def test_agent_status_pxl(spark, ctx):
    out = _run("agent_status/agent_status.pxl")
    assert out["output"].count() >= 1


def test_tracepoint_status_pxl(spark, ctx):
    out = _run(
        "tracepoint_status/tracepoint_status.pxl",
        calls=[("tracepoint_info", {}), ("running_tracepoints", {})],
    )
    for name in ("tracepoint_info", "running_tracepoints"):
        assert {"tracepoint_id", "name", "state", "status", "output_tables"} <= set(
            out[name].columns
        )


def test_upids_pxl(spark, ctx):
    out = _run(
        "upids/upids.pxl",
        calls=[("upids_for_namespace", {"start_time": "-1h", "namespace": "prod"})],
    )
    df = out["upids_for_namespace"]
    assert df.count() > 0
    assert {"pod", "container", "upid", "cmdline", "pod_create_time"} <= set(df.columns)


def test_nodes_pxl(spark, ctx):
    out = _run(
        "nodes/nodes.pxl",
        calls=[
            ("nodes", {"start_time": "-1h"}),
            ("pods_by_node", {"start_time": "-1h"}),
            ("process_stats", {"start_time": "-1h"}),
            ("network_stats", {"start_time": "-1h"}),
        ],
    )
    assert out["nodes"].count() > 0
    assert out["pods_by_node"].count() > 0
    assert out["process_stats"].count() > 0
    assert out["network_stats"].count() > 0


def test_namespaces_pxl(spark, ctx):
    out = _run(
        "namespaces/namespaces.pxl",
        calls=[
            ("namespaces_for_cluster", {"start_time": "-1h"}),
            ("process_stats_by_namespace", {"start_time": "-1h"}),
        ],
    )
    assert out["namespaces_for_cluster"].count() > 0
    assert out["process_stats_by_namespace"].count() > 0


# --- protocol tracer scripts (mysql/pgsql/redis/cql/kafka/...) ---------------

_DATA_ARGS = {"start_time": "-1h", "source_filter": "", "destination_filter": "",
              "num_head": 100}


def test_mysql_data_pxl(spark, ctx):
    out = _run("mysql_data/mysql_data.pxl", calls=[("mysql_data", _DATA_ARGS)])
    df = out["mysql_data"]
    assert df.count() > 0
    assert {"source", "destination", "req_cmd", "req_body", "resp_status",
            "latency"} <= set(df.columns)


def test_pgsql_data_pxl(spark, ctx):
    out = _run("pgsql_data/pgsql_data.pxl", calls=[("pgsql_data", _DATA_ARGS)])
    assert out["pgsql_data"].count() > 0


def test_redis_data_pxl(spark, ctx):
    out = _run("redis_data/redis_data.pxl", calls=[("redis_data", _DATA_ARGS)])
    df = out["redis_data"]
    assert df.count() > 0
    assert {"req_cmd", "req_args", "resp"} <= set(df.columns)


def test_cql_data_pxl(spark, ctx):
    out = _run("cql_data/data.pxl", calls=[("cql_data", _DATA_ARGS)])
    assert out["cql_data"].count() > 0


def test_dns_data_pxl(spark, ctx):
    out = _run("dns_data/data.pxl", calls=[("dns_data", _DATA_ARGS)])
    df = out["dns_data"]
    assert df.count() > 0
    assert {"req_header", "resp_body", "latency"} <= set(df.columns)


def test_kafka_data_pxl(spark, ctx):
    out = _run("kafka_data/kafka_data.pxl", calls=[("kafka_data", _DATA_ARGS)])
    assert out["kafka_data"].count() > 0


def test_mongodb_data_pxl(spark, ctx):
    out = _run("mongodb_data/mongodb_data.pxl", calls=[("mongodb_data", _DATA_ARGS)])
    assert out["mongodb_data"].count() > 0


def test_nats_data_pxl(spark, ctx):
    out = _run("nats_data/nats_data.pxl", calls=[("nats_data", _DATA_ARGS)])
    assert out["nats_data"].count() > 0


def test_mux_data_pxl(spark, ctx):
    out = _run("mux_data/data.pxl",
               calls=[("mux_data", {"start_time": "-1h", "num_head": 100})])
    assert out["mux_data"].count() > 0


def test_amqp_data_pxl(spark, ctx):
    args = {"start_time": "-1h", "source_filter": "", "destination_filter": ""}
    out = _run(
        "amqp_data/amqp_data.pxl",
        calls=[("amqp_data", args), ("amqp_msg_stats", args),
               ("amqp_flow_graph", {**args, "ns": "prod"})],
    )
    assert out["amqp_data"].count() > 0
    assert out["amqp_msg_stats"].count() > 0


def test_jvm_data_pxl(spark, ctx):
    # top-level script with a '-1m' window; pin now inside the sample span
    px.set_now(BASE_NS + 200 * 1_000_000_000)
    try:
        out = _run("jvm_data/stats.pxl")
    finally:
        px.set_now(BASE_NS + HOUR_NS)
    df = out["output"]
    assert df.count() > 0
    assert {"pid", "used_heap_size", "cmdline"} <= set(df.columns)


def test_mysql_stats_pxl(spark, ctx):
    pod_args = {"start_time": "-1h", "pod": "prod/"}
    out = _run(
        "mysql_stats/mysql_stats.pxl",
        calls=[("pod_mysql_let", pod_args), ("summary_mysql_let", pod_args),
               ("latency_histogram", pod_args)],
    )
    assert out["pod_mysql_let"].count() > 0
    assert out["latency_histogram"].count() > 0


def test_redis_stats_pxl(spark, ctx):
    pod_args = {"start_time": "-1h", "pod": "prod/"}
    out = _run(
        "redis_stats/redis_stats.pxl",
        calls=[("pod_redis_let", pod_args), ("latency_histogram", pod_args)],
    )
    assert out["pod_redis_let"].count() > 0


def test_pgsql_stats_pxl(spark, ctx):
    pod_args = {"start_time": "-1h", "pod": "prod/"}
    out = _run(
        "pgsql_stats/pgsql_stats.pxl",
        calls=[("pod_pgsql_let", pod_args), ("latency_histogram", pod_args)],
    )
    assert out["pod_pgsql_let"].count() > 0


def test_mysql_flow_graph_pxl(spark, ctx):
    out = _run(
        "mysql_flow_graph/mysql_flow_graph.pxl",
        calls=[("mysql_flow_graph",
                {"start_time": "-1h", "ns": "prod", "source_filter": "",
                 "destination_filter": ""})],
    )
    assert out["mysql_flow_graph"].count() > 0


def test_redis_flow_graph_pxl(spark, ctx):
    out = _run(
        "redis_flow_graph/redis_flow_graph.pxl",
        calls=[("redis_flow_graph",
                {"start_time": "-1h", "ns": "prod", "source_filter": "",
                 "destination_filter": ""})],
    )
    assert out["redis_flow_graph"].count() > 0


def test_dns_query_summary_pxl(spark, ctx):
    out = _run(
        "dns_query_summary/dns_query_summary.pxl",
        calls=[("dns_queries",
                {"start_time": "-1h", "namespace": "", "pod_filter": "",
                 "query_filter": "", "dns_server_filter": ""})],
    )
    assert out["dns_queries"].count() > 0


def test_cql_stats_pxl(spark, ctx):
    pod_args = {"start_time": "-1h", "pod": "prod/"}
    out = _run(
        "cql_stats/cql_stats.pxl",
        calls=[("pod_cql_let", pod_args), ("latency_histogram", pod_args),
               ("cmd_timeseries", pod_args)],
    )
    assert out["pod_cql_let"].count() > 0


def test_cql_flow_graph_pxl(spark, ctx):
    out = _run(
        "cql_flow_graph/cql_flow_graph.pxl",
        calls=[("cql_flow_graph",
                {"start_time": "-1h", "ns": "prod", "source_filter": "",
                 "destination_filter": ""})],
    )
    assert out["cql_flow_graph"].count() > 0


def test_pgsql_flow_graph_pxl(spark, ctx):
    out = _run(
        "pgsql_flow_graph/pgsql_flow_graph.pxl",
        calls=[("pgsql_flow_graph",
                {"start_time": "-1h", "ns": "prod", "source_filter": "",
                 "destination_filter": ""})],
    )
    assert out["pgsql_flow_graph"].count() > 0


def test_http_data_filtered_pxl(spark, ctx):
    out = _run(
        "http_data_filtered/data.pxl",
        calls=[("http_data", {"start_time": "-1h", "svc": "", "pod": "",
                              "req_path": "", "status_code": 200})],
    )
    assert out["http_data"].count() > 0


def test_http_post_requests_pxl(spark, ctx):
    out = _run("http_post_requests/data.pxl")
    df = out["output"]
    assert df.count() > 0


def test_largest_http_request_pxl(spark, ctx):
    out = _run("largest_http_request/data.pxl")
    assert out["requests_of_max_size"].count() >= 1


def test_http_trace_id_pxl(spark, ctx):
    out = _run(
        "http_trace_id/script.pxl",
        calls=[("http_trace_data",
                {"start_time": "-1h", "trace_header_name": "X-Request-Id",
                 "trace_id_filter": ""})],
    )
    assert "req_path" in out["http_trace_data"].columns


def test_inbound_outbound_conns_pxl(spark, ctx):
    out = _run("inbound_conns/data.pxl",
               calls=[("inbound_conns", {"start_time": "-1h", "ip_filter": ""})])
    assert out["inbound_conns"].count() > 0
    out = _run("outbound_conns/data.pxl",
               calls=[("outbound_conns", {"start_time": "-1h", "ip_filter": ""})])
    assert out["outbound_conns"].count() > 0


def test_ip_pxl(spark, ctx):
    args = {"start_time": "-1h", "ip": "10.0.0.2"}
    out = _run(
        "ip/ip.pxl",
        calls=[("ip_info", args), ("pod_traffic_to_ip", args),
               ("net_flow_graph", args), ("traffic_involving_ip", args)],
    )
    assert out["ip_info"].count() > 0


def test_pid_memory_usage_pxl(spark, ctx):
    # '-30s' window; pin now inside the process_stats sample span
    px.set_now(BASE_NS + 390 * 1_000_000_000)
    try:
        out = _run("pid_memory_usage/usage.pxl")
    finally:
        px.set_now(BASE_NS + HOUR_NS)
    assert out["output"].count() > 0


def test_pod_memory_usage_pxl(spark, ctx):
    px.set_now(BASE_NS + 390 * 1_000_000_000)
    try:
        out = _run("pod_memory_usage/pod.pxl")
    finally:
        px.set_now(BASE_NS + HOUR_NS)
    assert out["output"].count() > 0


def test_pod_lifetime_resource_pxl(spark, ctx):
    px.set_now(BASE_NS + 390 * 1_000_000_000)
    try:
        out = _run("pod_lifetime_resource/resource.pxl")
    finally:
        px.set_now(BASE_NS + HOUR_NS)
    assert out["output"].count() > 0


def test_agent_status_diagnostics_pxl(spark, ctx):
    out = _run("agent_status_diagnostics/agent_status.pxl")
    assert out["output"].count() >= 1


def test_jvm_stats_pxl(spark, ctx):
    out = _run(
        "jvm_stats/jvm_stats.pxl",
        calls=[("jvm_stats", {"start_time": "-1h", "node_name": "", "pod": ""})],
    )
    assert out["jvm_stats"].count() > 0


def test_perf_flamegraph_pxl(spark, ctx):
    out = _run(
        "perf_flamegraph/flamegraph.pxl",
        calls=[("stacktraces",
                {"start_time": "-1h", "node": "", "namespace": "", "pod": "",
                 "pct_basis_entity": "node"})],
    )
    assert out["stacktraces"].count() > 0


def test_differential_flamegraph_pxl(spark, ctx):
    out = _run(
        "differential_flamegraph/differential.pxl",
        calls=[("differential_flamegraph",
                {"start_time": "-1h", "namespace": "prod",
                 "pod": "prod/frontend-0000", "baseline_pod": "prod/api-0001"})],
    )
    assert "stack_traces" in set(out) or out


def test_service_stats_pxl(spark, ctx):
    args = {"start_time": "-1h", "svc": "prod/frontend"}
    out = _run(
        "service_stats/service_stats.pxl",
        calls=[("svc_let", args), ("http_code_histogram", args),
               ("latency_histogram", args)],
    )
    assert out["svc_let"].count() > 0


def test_service_edge_stats_pxl(spark, ctx):
    out = _run(
        "service_edge_stats/service_edge_stats.pxl",
        calls=[("svc_edge_let",
                {"start_time": "-1h", "requesting_svc": "prod/frontend",
                 "responding_svc": "prod/api"})],
    )
    assert "latency_p50" in set(out["svc_edge_let"].columns) or out


def test_service_resource_usage_pxl(spark, ctx):
    out = _run(
        "service_resource_usage/usage.pxl",
        calls=[("services_for_cluster", {"start_time": "-1h"})],
    )
    assert out["services_for_cluster"].count() > 0


def test_sql_queries_pxl(spark, ctx):
    out = _run(
        "sql_queries/normed_sql_queries.pxl",
        calls=[("pod_sql_let", {"start_time": "-1h", "pod": "prod/"}),
               ("summary_sql_let", {"start_time": "-1h", "pod": "prod/"})],
    )
    assert out["pod_sql_let"].count() > 0


def test_sql_query_pxl(spark, ctx):
    out = _run(
        "sql_query/normed_sql_query.pxl",
        calls=[("pod_sql_let",
                {"start_time": "-1h", "pod": "prod/",
                 "normed_query": "SELECT COUNT(*) FROM lineitem"})],
    )
    assert out["pod_sql_let"].count() > 0


def test_kafka_overview_pxl(spark, ctx):
    args = {"start_time": "-1h", "ns": "", "topic": ""}
    out = _run(
        "kafka_overview/kafka_overview.pxl",
        calls=[("kafka_flow_graph", args), ("kafka_topics_overview", args),
               ("kafka_brokers", args), ("kafka_producers", args),
               ("kafka_consumers", args)],
    )
    assert out["kafka_flow_graph"].count() > 0
    assert out["kafka_topics_overview"].count() > 0


def test_kafka_consumer_rebalancing_pxl(spark, ctx):
    out = _run(
        "kafka_consumer_rebalancing/kafka_consumer_rebalancing.pxl",
        calls=[
            ("kafka_join_sync_group_events", {"start_time": "-1h", "consumer_group_id": ""}),
            ("kafka_group_ids", {"start_time": "-1h"}),
            ("kafka_join_sync_delay", {"start_time": "-1h", "consumer_group_id": ""}),
        ],
    )
    assert out["kafka_group_ids"].count() > 0
    delay = out["kafka_join_sync_delay"]
    assert delay.count() > 0
    assert delay.where(F.col("delay") < 0).count() == 0


def test_kafka_producer_consumer_latency_pxl(spark, ctx):
    out = _run(
        "kafka_producer_consumer_latency/kafka_producer_consumer_latency.pxl",
        calls=[("kafka_topics", {"start_time": "-1h", "namespace": "prod"})],
    )
    assert out["kafka_topics"].count() > 0


def test_stirling_errors_pxl(spark, ctx):
    out = _run(
        "stirling_errors/stirling_errors.pxl",
        calls=[
            ("stirling_error", {"start_time": "-1h", "source_connector_filter": "",
                                "num_head": 100}),
            ("probe_status", {"start_time": "-1h", "tracepoint_filter": "",
                              "num_head": 100}),
        ],
    )
    assert out["stirling_error"].count() > 0
    assert out["probe_status"].count() > 0
    assert {"node", "source_connector", "status", "error"} <= set(
        out["stirling_error"].columns
    )


def test_pixie_quality_metrics_pxl(spark, ctx):
    px.set_now(BASE_NS + 390 * 1_000_000_000)  # '-300s' windows
    try:
        out = _run("pixie_quality_metrics/pixie_quality_metrics.pxl")
    finally:
        px.set_now(BASE_NS + HOUR_NS)
    assert out and any(df.count() > 0 for df in out.values())


def test_collect_agent_heaps_pxl(spark, ctx):
    out = _run(
        "collect_agent_heaps/collect_agent_heaps.pxl",
        calls=[("collect_pprofs", {"asid": 0})],
    )
    df = out["collect_pprofs"]
    rows = df.collect()
    assert rows and set(df.columns) == {"asid", "hostname", "heap"}
    assert all(r["heap"] for r in rows)


def test_pxviews_library_functions(spark, ctx):
    """Drive the pxviews library itself — every corpus dashboard builds
    on these views, so they must all produce rows on the fixtures."""
    code = "import px\nimport pxviews\n"
    outs = px.run_script(
        code
        + """
start = px.now() - px.hours(1)
px.display(pxviews.inbound_http_summary(start, px.now()), 'http_summary')
px.display(pxviews.container_process_summary(start, px.now()), 'cps')
px.display(pxviews.pod_resource_stats(start, px.now()), 'prs')
px.display(pxviews.pod_network_summary(start, px.now()), 'pns')
px.display(pxviews.connection_throughput_stats(start, px.now()), 'cts')
px.display(pxviews.stacktraces(start, px.now()), 'stacks')
""",
    )
    for name in ["http_summary", "cps", "prs", "pns", "cts", "stacks"]:
        assert outs[name].count() > 0, name
