"""Counter/gauge metric semantics (pattern types METRIC_COUNTER /
METRIC_GAUGE, types.proto:36-46).

The reference's overview scripts (e.g. px/pod_overview, px/net_flow_graph)
turn monotonic counters (conn_stats.bytes_sent, process_stats.cpu_utime_ns)
into rates by windowed max-min deltas per entity. Re-expressed as native
window/groupBy computations.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def counter_delta(
    df: DataFrame,
    key_cols: list[str],
    time_col: str,
    counter_cols: list[str],
    window_ns: int,
) -> DataFrame:
    """Per (key, tumbling window): counter increase = max - min within the
    window. Robust to sampling jitter; one hash aggregation.

    Counter resets (process restart → counter drops) clamp to ≥ 0 the way
    the reference's scripts do.
    """
    # integer bucketing — double division misbins ns-scale longs (>2^53)
    t = F.col(time_col)
    bucket = (t - F.pmod(t, F.lit(window_ns))).cast("long")
    aggs = []
    for c in counter_cols:
        aggs.append(F.max(c).alias(f"__max_{c}"))
        aggs.append(F.min(c).alias(f"__min_{c}"))
    out = df.withColumn("time_", bucket).groupBy("time_", *key_cols).agg(*aggs)
    for c in counter_cols:
        out = out.withColumn(
            f"{c}_delta",
            F.greatest(F.col(f"__max_{c}") - F.col(f"__min_{c}"), F.lit(0)),
        ).drop(f"__max_{c}", f"__min_{c}")
    return out


def counter_rate(
    df: DataFrame,
    key_cols: list[str],
    time_col: str,
    counter_cols: list[str],
    window_ns: int,
) -> DataFrame:
    """Counter increase per second per (key, window)."""
    out = counter_delta(df, key_cols, time_col, counter_cols, window_ns)
    secs = window_ns / 1_000_000_000
    for c in counter_cols:
        out = out.withColumn(f"{c}_per_s", F.col(f"{c}_delta") / F.lit(secs))
    return out


def gauge_summary(
    df: DataFrame,
    key_cols: list[str],
    time_col: str,
    gauge_cols: list[str],
    window_ns: int,
) -> DataFrame:
    """Per (key, window) gauge stats: avg/max (METRIC_GAUGE semantics)."""
    t = F.col(time_col)
    bucket = (t - F.pmod(t, F.lit(window_ns))).cast("long")
    aggs = []
    for c in gauge_cols:
        aggs.append(F.avg(c).alias(f"{c}_avg"))
        aggs.append(F.max(c).alias(f"{c}_max"))
    return df.withColumn("time_", bucket).groupBy("time_", *key_cols).agg(*aggs)
