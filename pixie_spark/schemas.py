"""Source-table schemas, registered ahead of time (no inference), mirroring
the reference's Stirling DataTableSchema definitions.

References (public pixie-io/pixie checkout):
- http_events:   src/stirling/source_connectors/socket_tracer/http_table.h:41-111
- conn_stats:    src/stirling/source_connectors/socket_tracer/conn_stats_table.h:29-59
- process_stats: src/stirling/source_connectors/process_stats/process_stats_table.h:41-63
- network_stats: src/stirling/source_connectors/network_stats/network_stats_table.h:38-61
- dns_events:    src/stirling/source_connectors/socket_tracer/dns_table.h:30-66
- k8s metadata dims: derived from src/carnot/funcs/metadata/metadata_ops.cc:35-139

Conventions (FIXTURES.md): ``time_`` is always column 0 (long ns, sorted);
``upid`` is struct<high,low>. At scale these tables are laid out
partitioned by a time bucket (e.g. dt=YYYY-MM-DD/hour) so time-range
predicates prune partitions — the Spark replacement for the reference's
time-ordered ring-buffer scan cursor (src/table_store/table/table.h:128).
"""

from __future__ import annotations

from pyspark.sql import types as T

from pixie_spark.types import BOOLEAN, INT64, STRING, TIME64NS, UINT128, field


def _schema(*fields: T.StructField) -> T.StructType:
    return T.StructType(list(fields))


HTTP_EVENTS = _schema(
    field("time_", TIME64NS, nullable=False),  # epoch ns, NOT a duration
    field("upid", UINT128, "ST_UPID", nullable=False),
    field("remote_addr", STRING, "ST_IP_ADDRESS"),
    field("remote_port", INT64, "ST_PORT"),
    field("local_addr", STRING, "ST_IP_ADDRESS"),
    field("local_port", INT64, "ST_PORT"),
    field("trace_role", INT64, pattern_type="GENERAL_ENUM"),
    field("encrypted", BOOLEAN),
    field("major_version", INT64),
    field("minor_version", INT64),
    field("content_type", INT64, pattern_type="GENERAL_ENUM"),
    field("req_headers", STRING, pattern_type="STRUCTURED"),
    field("req_method", STRING, "ST_HTTP_REQ_METHOD"),
    field("req_path", STRING),
    field("req_body", STRING, pattern_type="STRUCTURED"),
    field("req_body_size", INT64, "ST_BYTES"),
    field("resp_headers", STRING, pattern_type="STRUCTURED"),
    field("resp_status", INT64, "ST_HTTP_RESP_STATUS"),
    field("resp_message", STRING, "ST_HTTP_RESP_MESSAGE"),
    field("resp_body", STRING, pattern_type="STRUCTURED"),
    field("resp_body_size", INT64, "ST_BYTES"),
    field("latency", INT64, "ST_DURATION_NS"),
)

CONN_STATS = _schema(
    field("time_", TIME64NS, nullable=False),
    field("upid", UINT128, "ST_UPID", nullable=False),
    field("remote_addr", STRING, "ST_IP_ADDRESS"),
    field("remote_port", INT64, "ST_PORT"),
    field("trace_role", INT64, pattern_type="GENERAL_ENUM"),
    field("addr_family", INT64, pattern_type="GENERAL_ENUM"),
    field("protocol", INT64, pattern_type="GENERAL_ENUM"),
    field("ssl", BOOLEAN),
    field("conn_open", INT64, pattern_type="METRIC_COUNTER"),
    field("conn_close", INT64, pattern_type="METRIC_COUNTER"),
    field("conn_active", INT64, pattern_type="METRIC_GAUGE"),
    field("bytes_sent", INT64, "ST_BYTES", pattern_type="METRIC_COUNTER"),
    field("bytes_recv", INT64, "ST_BYTES", pattern_type="METRIC_COUNTER"),
)

PROCESS_STATS = _schema(
    field("time_", TIME64NS, nullable=False),
    field("upid", UINT128, "ST_UPID", nullable=False),
    field("major_faults", INT64, pattern_type="METRIC_COUNTER"),
    field("minor_faults", INT64, pattern_type="METRIC_COUNTER"),
    field("cpu_utime_ns", INT64, "ST_DURATION_NS", pattern_type="METRIC_COUNTER"),
    field("cpu_ktime_ns", INT64, "ST_DURATION_NS", pattern_type="METRIC_COUNTER"),
    field("num_threads", INT64, pattern_type="METRIC_GAUGE"),
    field("vsize_bytes", INT64, "ST_BYTES", pattern_type="METRIC_GAUGE"),
    field("rss_bytes", INT64, "ST_BYTES", pattern_type="METRIC_GAUGE"),
    field("rchar_bytes", INT64, "ST_BYTES", pattern_type="METRIC_COUNTER"),
    field("wchar_bytes", INT64, "ST_BYTES", pattern_type="METRIC_COUNTER"),
    field("read_bytes", INT64, "ST_BYTES", pattern_type="METRIC_COUNTER"),
    field("write_bytes", INT64, "ST_BYTES", pattern_type="METRIC_COUNTER"),
)

NETWORK_STATS = _schema(
    field("time_", TIME64NS, nullable=False),
    field("pod_id", STRING, nullable=False),
    field("rx_bytes", INT64, "ST_BYTES", pattern_type="METRIC_COUNTER"),
    field("tx_bytes", INT64, "ST_BYTES", pattern_type="METRIC_COUNTER"),
    field("rx_packets", INT64, pattern_type="METRIC_COUNTER"),
    field("tx_packets", INT64, pattern_type="METRIC_COUNTER"),
    field("rx_errors", INT64, pattern_type="METRIC_COUNTER"),
    field("tx_errors", INT64, pattern_type="METRIC_COUNTER"),
    field("rx_drops", INT64, pattern_type="METRIC_COUNTER"),
    field("tx_drops", INT64, pattern_type="METRIC_COUNTER"),
)

STACK_TRACES = _schema(
    # ref: src/stirling/source_connectors/perf_profiler/stack_traces_table.h
    field("time_", TIME64NS, nullable=False),
    field("upid", UINT128, "ST_UPID", nullable=False),
    field("stack_trace_id", INT64),
    field("stack_trace", STRING, pattern_type="STRUCTURED"),
    field("count", INT64, pattern_type="METRIC_COUNTER"),
)

DNS_EVENTS = _schema(
    field("time_", TIME64NS, nullable=False),
    field("upid", UINT128, "ST_UPID", nullable=False),
    field("remote_addr", STRING, "ST_IP_ADDRESS"),
    field("remote_port", INT64, "ST_PORT"),
    field("local_addr", STRING, "ST_IP_ADDRESS"),
    field("local_port", INT64, "ST_PORT"),
    field("trace_role", INT64, pattern_type="GENERAL_ENUM"),
    field("encrypted", BOOLEAN),
    field("req_header", STRING, pattern_type="STRUCTURED"),
    field("req_body", STRING, pattern_type="STRUCTURED"),
    field("resp_header", STRING, pattern_type="STRUCTURED"),
    field("resp_body", STRING, pattern_type="STRUCTURED"),
    field("latency", INT64, "ST_DURATION_NS"),
)

# --- protocol trace tables (socket_tracer/*_table.h) -------------------------
# Every socket-tracer table shares the canonical connection prefix
# (canonical_types.h: kTime kUPID kRemoteAddr kRemotePort kLocalAddr
# kLocalPort kTraceRole kEncrypted), then protocol payload columns, then
# latency (kLatencyNS) where the protocol is request-response.


def _proto_schema(*payload: T.StructField, latency: bool = True) -> T.StructType:
    fields = [
        field("time_", TIME64NS, nullable=False),
        field("upid", UINT128, "ST_UPID", nullable=False),
        field("remote_addr", STRING, "ST_IP_ADDRESS"),
        field("remote_port", INT64, "ST_PORT"),
        field("local_addr", STRING, "ST_IP_ADDRESS"),
        field("local_port", INT64, "ST_PORT"),
        field("trace_role", INT64, pattern_type="GENERAL_ENUM"),
        field("encrypted", BOOLEAN),
        *payload,
    ]
    if latency:
        fields.append(field("latency", INT64, "ST_DURATION_NS"))
    return _schema(*fields)


# mysql_table.h:37-68
MYSQL_EVENTS = _proto_schema(
    field("req_cmd", INT64, pattern_type="GENERAL_ENUM"),
    field("req_body", STRING, pattern_type="STRUCTURED"),
    field("resp_status", INT64, pattern_type="GENERAL_ENUM"),
    field("resp_body", STRING, pattern_type="STRUCTURED"),
)

# pgsql_table.h
PGSQL_EVENTS = _proto_schema(
    field("req_cmd", STRING, pattern_type="GENERAL_ENUM"),
    field("req", STRING, pattern_type="STRUCTURED"),
    field("resp", STRING, pattern_type="STRUCTURED"),
)

# redis_table.h
REDIS_EVENTS = _proto_schema(
    field("req_cmd", STRING, pattern_type="GENERAL_ENUM"),
    field("req_args", STRING, pattern_type="STRUCTURED"),
    field("resp", STRING, pattern_type="STRUCTURED"),
)

# cass_table.h
CQL_EVENTS = _proto_schema(
    field("req_op", INT64, pattern_type="GENERAL_ENUM"),
    field("req_body", STRING, pattern_type="STRUCTURED"),
    field("resp_op", INT64, pattern_type="GENERAL_ENUM"),
    field("resp_body", STRING, pattern_type="STRUCTURED"),
)

# kafka_table.h
KAFKA_EVENTS = _proto_schema(
    field("req_cmd", INT64, pattern_type="GENERAL_ENUM"),
    field("client_id", STRING),
    field("req_body", STRING, pattern_type="STRUCTURED"),
    field("resp", STRING, pattern_type="STRUCTURED"),
)

# mongodb_table.h
MONGODB_EVENTS = _proto_schema(
    field("req_cmd", STRING, pattern_type="GENERAL_ENUM"),
    field("req_body", STRING, pattern_type="STRUCTURED"),
    field("resp_status", STRING, pattern_type="GENERAL_ENUM"),
    field("resp_body", STRING, pattern_type="STRUCTURED"),
)

# nats_table.h (no latency column — fire-and-forget messaging)
NATS_EVENTS = _proto_schema(
    field("cmd", STRING, pattern_type="GENERAL_ENUM"),
    field("body", STRING, pattern_type="STRUCTURED"),
    field("resp", STRING, pattern_type="STRUCTURED"),
    latency=False,
)

# mux_table.h
MUX_EVENTS = _proto_schema(
    field("req_type", INT64, pattern_type="GENERAL_ENUM"),
)

# amqp_table.h
AMQP_EVENTS = _proto_schema(
    field("frame_type", INT64, pattern_type="GENERAL_ENUM"),
    field("channel", INT64),
    field("req_class_id", INT64, pattern_type="GENERAL_ENUM"),
    field("req_method_id", INT64, pattern_type="GENERAL_ENUM"),
    field("resp_class_id", INT64, pattern_type="GENERAL_ENUM"),
    field("resp_method_id", INT64, pattern_type="GENERAL_ENUM"),
    field("req_msg", STRING, pattern_type="STRUCTURED"),
    field("resp_msg", STRING, pattern_type="STRUCTURED"),
)

# stirling_error_table.h / probe_status_table.h (collector self-reporting)
STIRLING_ERROR = _schema(
    field("time_", TIME64NS, nullable=False),
    field("upid", UINT128, "ST_UPID", nullable=False),
    field("source_connector", STRING),
    field("status", INT64, pattern_type="GENERAL_ENUM"),
    field("error", STRING),
    field("context", STRING, pattern_type="STRUCTURED"),
)

PROBE_STATUS = _schema(
    field("time_", TIME64NS, nullable=False),
    field("upid", UINT128, "ST_UPID", nullable=False),
    field("source_connector", STRING),
    field("tracepoint", STRING),
    field("status", INT64, pattern_type="GENERAL_ENUM"),
    field("error", STRING),
    field("info", STRING, pattern_type="STRUCTURED"),
)

# jvm_stats_table.h (jvm_stats connector, not socket tracer)
JVM_STATS = _schema(
    field("time_", TIME64NS, nullable=False),
    field("upid", UINT128, "ST_UPID", nullable=False),
    field("young_gc_time", INT64, "ST_DURATION_NS", pattern_type="METRIC_COUNTER"),
    field("full_gc_time", INT64, "ST_DURATION_NS", pattern_type="METRIC_COUNTER"),
    field("used_heap_size", INT64, "ST_BYTES", pattern_type="METRIC_GAUGE"),
    field("total_heap_size", INT64, "ST_BYTES", pattern_type="METRIC_GAUGE"),
    field("max_heap_size", INT64, "ST_BYTES", pattern_type="METRIC_GAUGE"),
)


# k8s metadata dimension tables — these replace the reference's ~100
# metadata_ops UDFs with broadcast joins (SURVEY.md §2.4).

K8S_PODS = _schema(
    field("upid", UINT128, "ST_UPID", nullable=False),
    field("pod_id", STRING, nullable=False),
    field("pod_name", STRING, "ST_POD_NAME"),
    field("namespace", STRING, "ST_NAMESPACE_NAME"),
    field("node_name", STRING, "ST_NODE_NAME"),
    field("pod_ip", STRING, "ST_IP_ADDRESS"),
    field("service_id", STRING),
    field("replicaset_id", STRING),
    field("deployment_id", STRING),
    field("phase", STRING, "ST_POD_PHASE"),
    field("start_time", TIME64NS),
    field("stop_time", TIME64NS),
)

K8S_CONTAINERS = _schema(
    # per-process container attribution: ctx['container'/'cmdline'] and
    # container_id_to_status resolve against this dim
    field("upid", UINT128, "ST_UPID", nullable=False),
    field("container_id", STRING),
    field("container_name", STRING, "ST_CONTAINER_NAME"),
    field("cmdline", STRING),
    field("status", STRING, "ST_CONTAINER_STATUS"),
)

K8S_SERVICES = _schema(
    field("service_id", STRING, nullable=False),
    field("service_name", STRING, "ST_SERVICE_NAME"),
    field("namespace", STRING, "ST_NAMESPACE_NAME"),
    field("cluster_ip", STRING, "ST_IP_ADDRESS"),
    field("external_ips", STRING, pattern_type="STRUCTURED"),
)

K8S_REPLICASETS = _schema(
    field("replicaset_id", STRING, nullable=False),
    field("replicaset_name", STRING),
    field("namespace", STRING, "ST_NAMESPACE_NAME"),
    field("start_time", TIME64NS),
    field("stop_time", TIME64NS),
    field("status", STRING),
)

K8S_DEPLOYMENTS = _schema(
    field("deployment_id", STRING, nullable=False),
    field("deployment_name", STRING),
    field("namespace", STRING, "ST_NAMESPACE_NAME"),
    field("start_time", TIME64NS),
    field("stop_time", TIME64NS),
    field("status", STRING),
)

SOURCE_SCHEMAS: dict[str, T.StructType] = {
    "http_events": HTTP_EVENTS,
    "conn_stats": CONN_STATS,
    "process_stats": PROCESS_STATS,
    "network_stats": NETWORK_STATS,
    "dns_events": DNS_EVENTS,
    "mysql_events": MYSQL_EVENTS,
    "pgsql_events": PGSQL_EVENTS,
    "redis_events": REDIS_EVENTS,
    "cql_events": CQL_EVENTS,
    "kafka_events.beta": KAFKA_EVENTS,
    "mongodb_events": MONGODB_EVENTS,
    "nats_events.beta": NATS_EVENTS,
    "mux_events": MUX_EVENTS,
    "amqp_events": AMQP_EVENTS,
    "jvm_stats": JVM_STATS,
    "stirling_error": STIRLING_ERROR,
    "probe_status": PROBE_STATUS,
    "stack_traces.beta": STACK_TRACES,
    "k8s_pods": K8S_PODS,
    "k8s_containers": K8S_CONTAINERS,
    "k8s_services": K8S_SERVICES,
    "k8s_replicasets": K8S_REPLICASETS,
    "k8s_deployments": K8S_DEPLOYMENTS,
}
