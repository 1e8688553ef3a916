"""Custom stateful streaming operators via applyInPandasWithState.

The reference's stateful per-entity tracking (e.g. conn_stats: running
conn_open/close/active counters per upid, built by Stirling's
ConnTracker) is re-expressed as an arbitrary-stateful Structured
Streaming operator: state lives in the state store (checkpointed,
fault-tolerant), one state row per key, Arrow-batched updates.

``running_totals`` is the canonical example: per-key cumulative count /
sum / last-seen — the streaming twin of ``groupBy(k).agg(count, sum)``
with results emitted continuously per micro-batch.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T


def running_totals_schema(key_field: T.StructField) -> T.StructType:
    """Output schema: key + (n_events, total: double, last_seen)."""
    return T.StructType(
        [
            key_field,
            T.StructField("n_events", T.LongType()),
            T.StructField("total", T.DoubleType()),
            T.StructField("last_seen", T.LongType()),
        ]
    )


_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("total", T.DoubleType()),
        T.StructField("last_seen", T.LongType()),
    ]
)


def running_totals(
    df: DataFrame,
    key_col: str,
    value_col: str,
    time_col: str,
) -> DataFrame:
    """Per-key running (count, sum, last-seen) over a stream.

    Works on both streaming and batch frames (batch: one "micro-batch"
    spanning everything — the reference's one-model-two-modes duality).
    State per key is 24 bytes — 10⁹ tracked keys ≈ 24 GB across the
    cluster's state stores, well within bounds; pair with a watermark-
    driven timeout (GroupStateTimeout) to expire dead keys in production.
    """
    key_field = df.schema[key_col]
    out_schema = running_totals_schema(key_field)

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            n, total, last = state.get
        else:
            n, total, last = 0, 0.0, 0
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].sum())
            # dropna: a null time value would make max() NaN → int() crash,
            # killing the query. (Nulls also force pandas float64 for the
            # long column — ns precision beyond 2^53 is degraded on such
            # chunks; event-time columns are non-null by schema.)
            times = pdf[time_col].dropna()
            if len(times):
                last = max(last, int(times.max()))
        state.update((n, total, last))
        yield pd.DataFrame(
            {key_col: [key[0]], "n_events": [n], "total": [total], "last_seen": [last]}
        )

    grouped = df.groupBy(key_col)
    if df.isStreaming:
        return grouped.applyInPandasWithState(
            update, out_schema, _STATE_SCHEMA, "update", GroupStateTimeout.NoTimeout
        )

    # batch fallback: same semantics in one pass
    from pyspark.sql import functions as F

    return grouped.agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col(value_col).cast("double")).alias("total"),
        F.max(time_col).alias("last_seen"),
    )
