"""Range (interval) join — the remaining join class the reference lacks
(SURVEY §2.3: equijoin only; we add as-of in operators/asof.py and
banded range joins here).

A naive ``left.join(right, (rt >= lt+lo) & (rt <= lt+hi))`` has no
equi-conjunct, so Spark plans a cartesian/BNLJ — quadratic at scale. The
standard fix is bucketization: with band width W = hi - lo, bucket both
sides by ``time DIV W``; a right row matching ``rt ∈ [lt+lo, lt+hi]``
can only land in bucket((lt+lo)) or the one after it. Exploding the left
side into those two candidate buckets turns the range join into an
EQUIJOIN on (keys, bucket) — one shuffle — followed by the exact range
filter: linear in data + true matches.

All bucket arithmetic is integer (SQL DIV) — double division misbins
int64 ns timestamps (see SCALE.md / math_ops.bin).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_time: str,
    right_time: str,
    lower_ns: int,
    upper_ns: int,
    keys: list[str] | None = None,
) -> DataFrame:
    """Pairs where ``right_time ∈ [left_time + lower_ns, left_time +
    upper_ns]`` (inclusive), optionally also matching equality ``keys``.

    ``left_time``/``right_time`` must be plain column names (used inside
    SQL DIV expressions). Output: all left columns + right's non-key
    columns. One shuffle on (keys, bucket).
    """
    if upper_ns <= lower_ns:
        raise ValueError(
            f"band width must be positive, got [{lower_ns}, {upper_ns}] — for an "
            "exact-offset match (width 0) use an equijoin on time + offset"
        )
    width = upper_ns - lower_ns
    keys = keys or []
    overlap = (set(left.columns) & set(right.columns)) - set(keys)
    if overlap:
        raise ValueError(
            f"left and right share non-key columns {sorted(overlap)} — alias them "
            "apart first (the range filter would be ambiguous); left_time and "
            "right_time must also be distinct names"
        )
    bucket_col = "__pixie_range_bucket"
    while bucket_col in left.columns or bucket_col in right.columns:
        bucket_col += "_"

    lb = F.expr(f"({left_time} + ({lower_ns})) DIV {width}")
    l_exp = left.withColumn(bucket_col, F.explode(F.array(lb, lb + 1)))
    r_b = right.withColumn(bucket_col, F.expr(f"{right_time} DIV {width}"))

    joined = l_exp.join(r_b, [bucket_col, *keys], "inner")
    out = joined.where(
        (F.col(right_time) >= F.col(left_time) + lower_ns)
        & (F.col(right_time) <= F.col(left_time) + upper_ns)
    )
    return out.drop(bucket_col)
