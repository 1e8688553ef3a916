"""JSON functions. Reference: src/carnot/funcs/builtins/json_ops.cc:30-69
(pluck, pluck_int64, pluck_float64, pluck_array, split,
_script_reference)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(x) -> Column:
    return F.col(x) if isinstance(x, str) else x


def _path(key: str) -> str:
    return key if key.startswith("$") else f"$.{key}"


def _is_struct(col) -> bool:
    """True when ``col`` is a RESOLVED struct column (e.g. a bound
    ``df.latency_quantiles`` from the facade). The reference's quantiles
    output is plucked with the same pluck UDFs as JSON strings
    (math_sketches.h ST_QUANTILES), so pluck* accept both: struct →
    field access, string → JSON path. Unresolved columns fall through to
    the JSON path (their type is unknowable pre-analysis)."""
    if not isinstance(col, Column):
        return False
    try:
        expr = col._jc.node().expression()  # noqa: SLF001 — classic Column
        return expr.resolved() and expr.dataType().typeName() == "struct"
    except Exception:  # noqa: BLE001 — unresolved / connect-mode column
        return False


def pluck(col, key: str) -> Column:
    """Extract a JSON field as string (json_ops.cc 'pluck').

    The reference PluckUDF returns '' — not NULL — for a missing key,
    null value, or unparseable JSON (json_ops.h:39-56), so ported scripts
    comparing `pluck(...) == ''` or grouping on the result keep the same
    groups. Coalesce matches that."""
    if _is_struct(col):
        return F.coalesce(col.getField(key).cast("string"), F.lit(""))
    return F.coalesce(F.get_json_object(_c(col), _path(key)), F.lit(""))


def pluck_int64(col, key: str) -> Column:
    if _is_struct(col):
        return col.getField(key).cast("long")
    return F.get_json_object(_c(col), _path(key)).cast("long")


def pluck_float64(col, key: str) -> Column:
    if _is_struct(col):
        return col.getField(key).cast("double")
    return F.get_json_object(_c(col), _path(key)).cast("double")


def _is_array(col) -> bool:
    """True when ``col`` is a RESOLVED array column (px.split output)."""
    if not isinstance(col, Column):
        return False
    try:
        expr = col._jc.node().expression()  # noqa: SLF001
        return expr.resolved() and expr.dataType().typeName() == "array"
    except Exception:  # noqa: BLE001
        return False


def pluck_array(col, index: int = 0) -> Column:
    """PluckArrayUDF (json_ops.h:178-199): element ``index`` of a JSON
    array string as a string; '' on parse failure, out-of-range, or null
    element — never NULL. Accepts px.split's native array columns too
    (the reference's split emits a JSON-array string; corpus scripts
    chain split→pluck_array)."""
    c = _c(col)
    if _is_array(c):
        elem = F.element_at(c, index + 1)  # Spark element_at is 1-based
    else:
        elem = F.get_json_object(c, f"$[{index}]")
    return F.coalesce(elem.cast("string"), F.lit(""))


def split(col, delim: str) -> Column:
    """PxL's split returns a JSON-array STRING (json_ops.cc SplitUDF),
    so px.split → px.pluck_array chains work verbatim. The delimiter is
    literal, not a regex, hence the quoting."""
    import re as _re

    return F.to_json(F.split(_c(col), _re.escape(delim)))


def script_reference(label, script: str, args: dict[str, str] | None = None) -> Column:
    """UI deep-link blob: {label, script, args} as a JSON string
    (json_ops.cc '_script_reference'). Args values may be Columns."""
    args = args or {}
    label_c = label if isinstance(label, Column) else F.lit(label)
    arg_struct = F.struct(
        *[
            (v if isinstance(v, Column) else F.lit(v)).alias(k)
            for k, v in args.items()
        ]
    ) if args else F.lit(None)
    return F.to_json(
        F.struct(
            label_c.alias("label"),
            F.lit(script).alias("script"),
            *( [arg_struct.alias("args")] if args else [] ),
        )
    )
