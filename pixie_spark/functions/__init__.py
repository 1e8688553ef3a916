"""The function registry — PxL UDF names → native Spark Column builders.

Reference registry framework: src/carnot/udf/registry.h (names overloaded
by arg type; Spark columns are generically typed so one entry per name).
Families mirror src/carnot/funcs/builtins/* — see each submodule's
docstring for the file-level citation.

``REGISTRY`` maps the PxL-visible name (e.g. 'px.mean', 'px.pluck') to a
callable returning a Column. The API layer (pixie_spark.api) resolves
('col', 'px.mean')-style agg tuples through this table. User extension
comes free via Spark UDF/pandas_udf — unlike the reference, whose
registry is compiled in (SURVEY §2.5).
"""

from __future__ import annotations

from typing import Callable

from pixie_spark.functions import (
    collections,
    conditionals,
    json_ops,
    math_ops,
    metadata,
    ml_ops,
    net_ops,
    pii_ops,
    protocols,
    regex_ops,
    request_path_ops,
    sql_ops,
    string_ops,
    uri_ops,
)

REGISTRY: dict[str, Callable] = {}


def _register(module, names: list[str]) -> None:
    for n in names:
        REGISTRY[n] = getattr(module, n)


_register(
    math_ops,
    [
        "add", "subtract", "multiply", "divide", "modulo",
        "log", "ln", "log2", "log10", "pow", "exp", "abs", "sqrt",
        "ceil", "floor", "round", "bin", "negate", "invert",
        "logicalAnd", "logicalOr", "logicalNot",
        "equal", "notEqual", "approxEqual",
        "greaterThan", "greaterThanEqual", "lessThan", "lessThanEqual",
        "time_to_int64", "int64_to_time",
        "mean", "sum", "max", "min", "count", "quantiles", "quantiles_json",
    ],
)
_register(
    string_ops,
    [
        "contains", "length", "find", "substring", "tolower", "toupper",
        "trim", "strip_prefix", "hex_to_ascii", "bytes_to_hex", "atoi", "itoa",
        "replace",
    ],
)
_register(json_ops, ["pluck", "pluck_int64", "pluck_float64", "pluck_array", "split"])
REGISTRY["_script_reference"] = json_ops.script_reference
_register(regex_ops, ["regex_match", "regex_replace"])
_register(conditionals, ["select"])
_register(collections, ["any"])
_register(uri_ops, ["uri_encode", "uri_decode", "uri_parse", "uri_recompose"])
_register(sql_ops, ["normalize_mysql", "normalize_pgsql"])
_register(pii_ops, ["redact_pii_best_effort"])
_register(
    protocols,
    ["protocol_name", "http_resp_message", "kafka_api_key_name", "trace_role_name",
     "cql_opcode_name", "mux_frame_type_name", "amqp_frame_type_name",
     "amqp_method_name"],
)
_register(net_ops, ["ip_is_private", "ip_to_int"])
_register(request_path_ops, ["template_path"])
REGISTRY["_text_embedding"] = ml_ops.text_embedding
REGISTRY["_encode_sentence_piece"] = ml_ops.encode_sentence_piece

# UPID helpers live in pixie_spark.types (struct<high,low> representation)
from pixie_spark.types import (  # noqa: E402
    make_upid,
    upid_to_asid,
    upid_to_pid,
    upid_to_start_ts,
    upid_to_string,
)

_register_upid = {
    "make_upid": make_upid,
    "upid_to_asid": upid_to_asid,
    "upid_to_pid": upid_to_pid,
    "upid_to_start_ts": upid_to_start_ts,
    "upid_to_string": upid_to_string,
}
REGISTRY.update(_register_upid)


def _asid():
    """px.asid() (ASIDUDF, src/carnot/funcs/metadata/metadata_ops.h): the
    short id of the agent EXECUTING the fragment — execution-context
    state, not data. The engine's agent enumeration maps agents to
    executors (api._executors()); in local mode that is the single
    driver entry, asid 0, which is what every row scanned by this engine
    gets. Per-agent UDTFs (GetProfilerSamplingPeriodMS et al.) emit a row
    for asid 0 first, so merges on asid behave as in the reference."""
    from pyspark.sql import functions as F

    return F.lit(0).cast("long")


REGISTRY["asid"] = _asid


class _PProfAggMarker:
    """px.pprof (pprof_ops.h:35, registered as 'pprof'): a 3-arg UDA that
    the facade rewrites into a plan (histogram reduce + wire-format
    encode, operators/pprof.py) rather than a column expression — its
    serialized t-state has no scalar analogue."""

    _is_pprof_agg = True
    __name__ = "pprof"

    def __call__(self, *_):
        raise TypeError(
            "px.pprof is an aggregate: df.agg(p=('stack_trace', 'count', "
            "'profiler_sampling_period_ms', px.pprof))"
        )


REGISTRY["pprof"] = _PProfAggMarker()


def lookup(name: str) -> Callable:
    """Resolve a PxL function name ('px.mean' or 'mean')."""
    key = name.removeprefix("px.")
    if key not in REGISTRY:
        raise KeyError(f"unknown function {name!r}; {len(REGISTRY)} registered")
    return REGISTRY[key]


__all__ = ["REGISTRY", "lookup", "metadata", "ml_ops", "request_path_ops"]
