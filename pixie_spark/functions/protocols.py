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


def _map_expr(col: Column, mapping: dict, default: str | Column = "Unknown") -> Column:
    expr = None
    default = F.lit(default) if isinstance(default, str) else default
    for k, v in mapping.items():
        cond = col == k
        expr = F.when(cond, v) if expr is None else expr.when(cond, v)
    return expr.otherwise(default) if expr is not None else default


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


# CQL wire opcodes (protocols/cql.h RequestOpcodeToName; default = the
# numeric code as a string, matching the reference's std::to_string)
CQL_OPCODES = {
    0x00: "Error", 0x01: "Startup", 0x02: "Ready", 0x03: "Authenticate",
    0x05: "Options", 0x06: "Supported", 0x07: "Query", 0x08: "Result",
    0x09: "Prepare", 0x0A: "Execute", 0x0B: "Register", 0x0C: "Event",
    0x0D: "Batch", 0x0E: "AuthChallenge", 0x0F: "AuthResponse",
    0x10: "AuthSuccess",
}


def cql_opcode_name(col) -> Column:
    c = _c(col)
    return _map_expr(c, CQL_OPCODES, c.cast("string"))


# Mux frame types (protocols/mux.h FrameTypeName)
MUX_FRAME_TYPES = {
    1: "Treq", -1: "Rreq", 2: "Tdispatch", -2: "Rdispatch",
    64: "Tdrain", -64: "Rdrain", 65: "Tping", -65: "Rping",
    66: "Tdiscarded", -66: "Rdiscarded", 67: "Tlease", 68: "Tinit",
    -68: "Rinit", -128: "Rerr", 127: "Rerr (legacy)",
    -62: "Tdiscarded (legacy)",
}


def mux_frame_type_name(col) -> Column:
    c = _c(col)
    return _map_expr(c, MUX_FRAME_TYPES, F.concat(F.lit("Unknown ("), c.cast("string"), F.lit(")")))


# AMQP frame types and (class_id, method_id) names (protocols/amqp.h)
AMQP_FRAME_TYPES = {1: "Frame method", 2: "Content Header", 3: "Content Body", 8: "Heartbeat"}

AMQP_CLASSES = {10: "Connection", 20: "Channel", 40: "Exchange", 50: "Queue", 60: "Basic", 90: "Tx"}

AMQP_METHODS = {
    (10, 10): "ConnectionStart", (10, 11): "ConnectionStart-ok",
    (10, 20): "ConnectionSecure", (10, 21): "ConnectionSecure-ok",
    (10, 30): "ConnectionTune", (10, 31): "ConnectionTune-ok",
    (10, 40): "ConnectionOpen", (10, 41): "ConnectionOpen-ok",
    (10, 50): "ConnectionClose", (10, 51): "ConnectionClose-ok",
    (20, 10): "ChannelOpen", (20, 11): "ChannelOpen-ok",
    (20, 20): "ChannelFlow", (20, 21): "ChannelFlow-ok",
    (20, 40): "ChannelClose", (20, 41): "ChannelClose-ok",
    (40, 10): "ExchangeDeclare", (40, 11): "ExchangeDeclare-ok",
    (40, 20): "ExchangeDelete", (40, 21): "ExchangeDelete-ok",
    (50, 10): "QueueDeclare", (50, 11): "QueueDeclare-ok",
    (50, 20): "QueueBind", (50, 21): "QueueBind-ok",
    (50, 50): "QueueUnbind", (50, 51): "QueueUnbind-ok",
    (50, 30): "QueuePurge", (50, 31): "QueuePurge-ok",
    (50, 40): "QueueDelete", (50, 41): "QueueDelete-ok",
    (60, 10): "BasicQos", (60, 11): "BasicQos-ok",
    (60, 20): "BasicConsume", (60, 21): "BasicConsume-ok",
    (60, 30): "BasicCancel", (60, 31): "BasicCancel-ok",
    (60, 40): "BasicPublish", (60, 50): "BasicReturn",
    (60, 60): "BasicDeliver", (60, 70): "BasicGet",
    (60, 71): "BasicGet-ok", (60, 72): "BasicGet-empty",
    (60, 80): "BasicAck", (60, 90): "BasicReject",
    (60, 100): "BasicRecover-async", (60, 110): "BasicRecover",
    (60, 111): "BasicRecover-ok",
    (90, 10): "TxSelect", (90, 11): "TxSelect-ok",
    (90, 20): "TxCommit", (90, 21): "TxCommit-ok",
    (90, 30): "TxRollback", (90, 31): "TxRollback-ok",
}


def amqp_frame_type_name(col) -> Column:
    c = _c(col)
    return _map_expr(c, AMQP_FRAME_TYPES, c.cast("string"))


def amqp_method_name(class_col, method_col) -> Column:
    """amqp.h ClassIdMethodIdToMethodName: (class_id, method_id) → name;
    method_id 0 falls back to the class name."""
    cls, mth = _c(class_col), _c(method_col)
    expr = F.when((cls != 0) & (mth == 0), _map_expr(cls, AMQP_CLASSES))
    for (c_id, m_id), name in AMQP_METHODS.items():
        expr = expr.when((cls == c_id) & (mth == m_id), name)
    return expr.otherwise("Unknown")
