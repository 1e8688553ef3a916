"""Math / comparison / aggregate functions.

Reference: src/carnot/funcs/builtins/math_ops.cc:58-250 (120 scalar
registrations + the mean/sum/max/min/count UDAs, classes in
math_ops.h:585-760) and math_sketches.cc (quantiles t-digest UDA).

All map to native JVM expressions; nothing here leaves codegen.
PxL overloads by argument type — Spark functions are already generic.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(x) -> Column:
    return F.col(x) if isinstance(x, str) else (F.lit(x) if not isinstance(x, Column) else x)


# scalar ----------------------------------------------------------------------

def add(a, b) -> Column:
    return _c(a) + _c(b)


def subtract(a, b) -> Column:
    return _c(a) - _c(b)


def multiply(a, b) -> Column:
    return _c(a) * _c(b)


def divide(a, b) -> Column:
    return _c(a) / _c(b)


def modulo(a, b) -> Column:
    return _c(a) % _c(b)


def log(x) -> Column:  # natural log (math_ops.cc 'ln'-equivalent 'log')
    return F.log(_c(x))


def ln(x) -> Column:
    return F.log(_c(x))


def log2(x) -> Column:
    return F.log2(_c(x))


def log10(x) -> Column:
    return F.log10(_c(x))


def pow(x, y) -> Column:  # noqa: A001
    return F.pow(_c(x), _c(y))


def exp(x) -> Column:
    return F.exp(_c(x))


def abs(x) -> Column:  # noqa: A001
    return F.abs(_c(x))


def sqrt(x) -> Column:
    return F.sqrt(_c(x))


def ceil(x) -> Column:
    return F.ceil(_c(x))


def floor(x) -> Column:
    return F.floor(_c(x))


def round(x, scale: int = 0) -> Column:  # noqa: A001
    return F.round(_c(x), scale)


def bin(x, width) -> Column:
    """Time/value bucketing: floor(x/width)*width in PURE INTEGER
    arithmetic (x - pmod(x, w)). Ref: math_ops.cc:209-216 — the workhorse
    of PxL time-series queries.

    floor(x/w)*w via doubles misbins int64 ns timestamps: ~1.7e18 exceeds
    2^53, so the long→double conversion rounds by up to ~128 ns and rows
    near a boundary land in the adjacent window. pmod keeps floor
    semantics for negative values too."""
    xc, w = _c(x), _c(width)
    return (xc - F.pmod(xc, w)).cast("long")


def negate(x) -> Column:
    return -_c(x)


def invert(x) -> Column:
    return F.bitwise_not(_c(x))


def logicalAnd(a, b) -> Column:  # noqa: N802
    return _c(a) & _c(b)


def logicalOr(a, b) -> Column:  # noqa: N802
    return _c(a) | _c(b)


def logicalNot(x) -> Column:  # noqa: N802
    return ~_c(x)


def _rhs(b):
    """Comparison right-hand sides are VALUES in PxL — px.equal(df.col,
    'literal') compares against the string, never a column of that name
    (corpus: kafka_consumer_rebalancing get_and_filter_group_id)."""
    return b if isinstance(b, Column) else F.lit(b)


def equal(a, b) -> Column:
    return _c(a) == _rhs(b)


def notEqual(a, b) -> Column:  # noqa: N802
    return _c(a) != _rhs(b)


def approxEqual(a, b, tol: float = 1e-9) -> Column:  # noqa: N802
    return F.abs(_c(a) - _rhs(b)) < tol


def greaterThan(a, b) -> Column:  # noqa: N802
    return _c(a) > _rhs(b)


def greaterThanEqual(a, b) -> Column:  # noqa: N802
    return _c(a) >= _rhs(b)


def lessThan(a, b) -> Column:  # noqa: N802
    return _c(a) < _rhs(b)


def lessThanEqual(a, b) -> Column:  # noqa: N802
    return _c(a) <= _rhs(b)


def time_to_int64(x) -> Column:
    return _c(x).cast("long")


def int64_to_time(x) -> Column:
    return _c(x).cast("long")


# aggregates (UDA equivalents) ------------------------------------------------

def mean(x) -> Column:
    return F.avg(_c(x))


def sum(x) -> Column:  # noqa: A001
    return F.sum(_c(x))


def max(x) -> Column:  # noqa: A001
    return F.max(_c(x))


def min(x) -> Column:  # noqa: A001
    return F.min(_c(x))


def count(x) -> Column:
    return F.count(_c(x))


def quantiles(x, probs: list[float] | None = None, accuracy: int = 10000) -> Column:
    """The reference's t-digest 'quantiles' UDA → approx_percentile struct.

    Ref: src/carnot/funcs/builtins/math_sketches.h:92-129 (serialized
    t-digest with ST_QUANTILES semantic type, plucked via px.pluck_float64).
    Spark's approx_percentile is the same shape: mergeable sketch with
    partial/finalize — safe for 100 TB two-phase aggregation. Output is a
    struct {p01,p10,p25,p50,p75,p90,p99} mirroring the JSON keys the
    reference emits.
    """
    probs = probs or [0.01, 0.10, 0.25, 0.50, 0.75, 0.90, 0.99]
    arr = F.percentile_approx(_c(x), F.array(*[F.lit(p) for p in probs]), F.lit(accuracy))
    names = [f"p{str(p).replace('0.', '').ljust(2, '0')}" for p in probs]
    return F.struct(*[arr[i].alias(names[i]) for i in range(len(probs))])


def quantiles_json(x, probs: list[float] | None = None, accuracy: int = 10000) -> Column:
    """Reference-shaped quantiles output: a JSON STRING like the
    serialized t-digest display form ('{"p50": ..., "p99": ...}',
    ST_QUANTILES semantic type) — so scripts using the reference idiom
    ``px.pluck_float64(df.q, 'p99')`` work verbatim."""
    return F.to_json(quantiles(x, probs, accuracy))
