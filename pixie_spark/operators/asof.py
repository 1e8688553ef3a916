"""As-of (time-travel) join and sessionization — time-series operators
the reference lacks (SURVEY §2.3: equijoin only) but that a complete
analytics engine needs; both are single-shuffle constructions.

asof_join: for each left row, the latest right row with
right.time <= left.time (per key). Implemented with the union+window
trick: tag sides, union, per-key window ordered by (time, side), carry
the last right value forward with last(ignorenulls=True). ONE shuffle on
the key — no range-join blowup, no per-row binary search; this is the
standard Spark formulation for billion-row backfills.

sessionize: gap-based session ids per key (new session when the gap
from the previous event exceeds the timeout). lag + running sum of
session-starts over a per-key window — one shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    value_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join: latest right row with time <= left time per key.

    Output: all left columns + value_cols (suffixed) from the matched
    right row (null when no prior right row exists).
    """
    lcols = left.columns
    l_tagged = left.select(
        F.col(on).alias("__key"),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__side"),
        F.struct(*lcols).alias("__l"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in value_cols],
    )
    r_tagged = right.select(
        F.col(on).alias("__key"),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(
            l_tagged.schema["__l"].dataType
        ).alias("__l"),
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
    )
    # right rows sort before left rows at equal time (side 0 < 1) so a
    # same-timestamp right row IS visible to the left row (<= semantics).
    w = (
        Window.partitionBy("__key")
        .orderBy("__t", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    unioned = l_tagged.unionByName(r_tagged)
    carried = unioned.select(
        "__side",
        "__l",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__rv_{c}")
            for c in value_cols
        ],
    )
    out = carried.where(F.col("__side") == 1).select(
        *[F.col(f"__l.{c}").alias(c) for c in lcols],
        *[F.col(f"__rv_{c}").alias(f"{c}{suffix}") for c in value_cols],
    )
    return out


def sessionize(
    df: DataFrame,
    key_col: str,
    time_col: str,
    gap: int,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Assign session ids per key: a new session starts when the gap from
    the previous event exceeds ``gap`` (same units as time_col).

    Adds: session_id (0-based per key), session_start (time of first
    event in the session). Pass ``tiebreak_col`` (a unique column) to make
    the running sum deterministic when events share a timestamp — without
    it, which of two tied rows "starts" a session is engine-dependent.
    """
    order = [time_col] if tiebreak_col is None else [time_col, tiebreak_col]
    w = Window.partitionBy(key_col).orderBy(*order)
    prev = F.lag(time_col).over(w)
    is_new = F.when(prev.isNull() | ((F.col(time_col) - prev) > gap), 1).otherwise(0)
    df2 = df.withColumn("__new", is_new).withColumn(
        "session_id", F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0)) - 1
    )
    ws = Window.partitionBy(key_col, "session_id")
    return df2.withColumn("session_start", F.min(time_col).over(ws)).drop("__new")
