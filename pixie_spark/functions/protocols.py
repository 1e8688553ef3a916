"""Protocol / enum name decoding.

Reference: src/carnot/funcs/protocols/protocol_ops.cc (protocol names,
HTTP status messages, kafka opcodes, amqp/mysql/cql codes). Small static
code→name maps → chained when() expressions (for ≤~30 entries) — these
fold into codegen; larger maps would become broadcast-map dimension
tables (see pixie_spark.functions.metadata for that pattern).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(x) -> Column:
    return F.col(x) if isinstance(x, str) else x


def _map_expr(col: Column, mapping: dict, default: str = "Unknown") -> Column:
    expr = None
    for k, v in mapping.items():
        cond = col == k
        expr = F.when(cond, v) if expr is None else expr.when(cond, v)
    return expr.otherwise(default) if expr is not None else F.lit(default)


# traffic protocol enum (src/shared/protocols, stirling protocol IDs)
PROTOCOLS = {
    0: "Unknown",
    1: "HTTP",
    2: "HTTP2",
    3: "MySQL",
    4: "CQL",
    5: "PGSQL",
    6: "DNS",
    7: "Redis",
    8: "NATS",
    9: "Mongo",
    10: "Kafka",
    11: "Mux",
    12: "AMQP",
    13: "TLS",
}

HTTP_STATUS_MESSAGES = {
    100: "Continue",
    200: "OK",
    201: "Created",
    204: "No Content",
    301: "Moved Permanently",
    302: "Found",
    304: "Not Modified",
    400: "Bad Request",
    401: "Unauthorized",
    403: "Forbidden",
    404: "Not Found",
    405: "Method Not Allowed",
    408: "Request Timeout",
    409: "Conflict",
    429: "Too Many Requests",
    500: "Internal Server Error",
    502: "Bad Gateway",
    503: "Service Unavailable",
    504: "Gateway Timeout",
}

KAFKA_OPCODES = {
    0: "Produce",
    1: "Fetch",
    2: "ListOffsets",
    3: "Metadata",
    8: "OffsetCommit",
    9: "OffsetFetch",
    10: "FindCoordinator",
    11: "JoinGroup",
    12: "Heartbeat",
    13: "LeaveGroup",
    14: "SyncGroup",
    18: "ApiVersions",
    19: "CreateTopics",
    20: "DeleteTopics",
}


def protocol_name(col) -> Column:
    return _map_expr(_c(col), PROTOCOLS)


def http_resp_message(col) -> Column:
    return _map_expr(_c(col), HTTP_STATUS_MESSAGES)


def kafka_api_key_name(col) -> Column:
    return _map_expr(_c(col), KAFKA_OPCODES)


def trace_role_name(col) -> Column:
    return _map_expr(_c(col), {1: "client", 2: "server"}, "unknown")
