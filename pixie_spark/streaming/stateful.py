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


def anomaly_schema(entity_field: T.StructField, ts_field: T.StructField) -> T.StructType:
    return T.StructType(
        [
            entity_field,
            ts_field,
            T.StructField("value", T.DoubleType()),
            T.StructField("baseline_n", T.LongType()),
            T.StructField("z", T.DoubleType()),
            T.StructField("is_anomaly", T.BooleanType()),
        ]
    )


_ANOMALY_STATE = T.StructType([T.StructField("vals", T.ArrayType(T.DoubleType()))])


def streaming_anomalies(
    df: DataFrame,
    entity_col: str = "entity",
    ts_col: str = "ts",
    value_col: str = "value",
    baseline_rows: int = 20,
    min_support: int = 8,
    z_threshold: float = 3.0,
) -> DataFrame:
    """Real-time twin of operators/timeseries.rolling_anomalies: per-
    entity trailing-z anomaly flags over a stream, with the trailing
    window living in the state store (≤ baseline_rows doubles per
    entity — bounded state by construction, checkpoint-recoverable).

    Semantics are IDENTICAL to the batch operator when events arrive in
    event-time order (the stream≡batch duality test): baseline excludes
    the current point, warm-up gated, flat-baseline jumps flagged.
    Batch frames fall back to the window implementation — one model,
    two modes.
    """
    if not df.isStreaming:
        from pyspark.sql import functions as F

        from pixie_spark.operators.timeseries import rolling_anomalies

        return rolling_anomalies(
            df, entity_col, ts_col, value_col, baseline_rows, min_support, z_threshold
        ).select(
            entity_col, ts_col, F.col(value_col).cast("double").alias("value"),
            "baseline_n", "z", "is_anomaly",
        )

    out_schema = anomaly_schema(df.schema[entity_col], df.schema[ts_col])

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        vals: list = list(state.get[0]) if state.exists else []
        ents, tss, vs, ns, zs, flags = [], [], [], [], [], []
        for pdf in pdfs:
            for _, row in pdf.sort_values(ts_col).iterrows():
                v = float(row[value_col])
                n = len(vals)
                z, flag = None, False
                if n >= min_support:
                    mu = sum(vals) / n
                    var = sum((x - mu) ** 2 for x in vals) / n
                    sd = var**0.5
                    if sd > 0:
                        z = (v - mu) / sd
                        flag = abs(z) >= z_threshold
                    elif v != mu:
                        flag = True  # jump off a perfectly flat baseline
                ents.append(key[0])
                tss.append(row[ts_col])
                vs.append(v)
                ns.append(n)
                zs.append(z)
                flags.append(flag)
                vals.append(v)
                if len(vals) > baseline_rows:
                    vals.pop(0)
        state.update((vals,))
        yield pd.DataFrame(
            {
                entity_col: ents,
                ts_col: tss,
                "value": vs,
                "baseline_n": ns,
                "z": zs,
                "is_anomaly": flags,
            }
        )

    return df.groupBy(entity_col).applyInPandasWithState(
        update, out_schema, _ANOMALY_STATE, "append", GroupStateTimeout.NoTimeout
    )


def pattern_match_schema(entity_field: T.StructField, ts_field: T.StructField) -> T.StructType:
    return T.StructType(
        [
            entity_field,
            ts_field,  # window START time
            T.StructField("dist", T.DoubleType()),
        ]
    )


_PATTERN_STATE = T.StructType(
    [
        T.StructField("vals", T.ArrayType(T.DoubleType())),
        T.StructField("tss", T.ArrayType(T.LongType())),
    ]
)


def streaming_pattern_match(
    df: DataFrame,
    pattern: list,
    max_dist: float,
    entity_col: str = "entity",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Real-time incident-signature detection: emit (entity, window
    start ts, dist) whenever the last m points of an entity's series
    z-normalize to within ``max_dist`` of the z-normalized query
    pattern — the streaming twin of operators/timeseries.pattern_search
    with the m-1 point history living in the state store (m-1 doubles +
    longs per entity; bounded by the pattern length, not the stream).

    A window is scored exactly once — when its LAST point arrives — so
    the emitted match set over any prefix of the stream equals the
    batch operator's matches filtered to dist ≤ max_dist (duality
    test). Batch frames route to the batch operator directly.
    """
    from pixie_spark.operators.timeseries import _znorm_pattern

    m = len(pattern)
    if m < 2:
        raise ValueError("pattern must have at least 2 points")
    zq = _znorm_pattern(pattern)

    if not df.isStreaming:
        from pyspark.sql import functions as F

        from pixie_spark.operators.timeseries import pattern_scores

        # Threshold filter over the distributed scores — no global
        # top-k/orderBy, so nothing TakeOrdered-collects the whole
        # scored window set onto the driver for a large batch frame.
        scored = pattern_scores(df, pattern, entity_col, ts_col, value_col)
        return scored.where(F.col("dist") <= max_dist).select(entity_col, ts_col, "dist")

    out_schema = pattern_match_schema(df.schema[entity_col], df.schema[ts_col])

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            vals, tss = list(state.get[0]), list(state.get[1])
        else:
            vals, tss = [], []
        ents, starts, dists = [], [], []
        for pdf in pdfs:
            for _, row in pdf.sort_values(ts_col).iterrows():
                vals.append(float(row[value_col]))
                tss.append(int(row[ts_col]))
                if len(vals) > m:
                    vals.pop(0)
                    tss.pop(0)
                if len(vals) == m:
                    mu = sum(vals) / m
                    var = sum((x - mu) ** 2 for x in vals) / m
                    sd = var**0.5
                    if sd > 0:
                        d = sum(
                            ((x - mu) / sd - q) ** 2 for x, q in zip(vals, zq)
                        )
                        if d <= max_dist:
                            ents.append(key[0])
                            starts.append(tss[0])
                            dists.append(d)
        state.update((vals, tss))
        yield pd.DataFrame({entity_col: ents, ts_col: starts, "dist": dists})

    return df.groupBy(entity_col).applyInPandasWithState(
        update, out_schema, _PATTERN_STATE, "append", GroupStateTimeout.NoTimeout
    )


def resample_schema(entity_field: T.StructField) -> T.StructType:
    return T.StructType(
        [
            entity_field,
            T.StructField("ts", T.LongType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("filled", T.BooleanType()),
        ]
    )


_RESAMPLE_STATE = T.StructType(
    [
        T.StructField("next_grid", T.LongType()),
        T.StructField("cur_val", T.DoubleType()),
        T.StructField("cur_src", T.LongType()),
    ]
)


def streaming_resample_ffill(
    df: DataFrame,
    step: int,
    max_fill_steps: int | None = None,
    entity_col: str = "entity",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Streaming twin of operators/timeseries.resample_ffill: as each
    entity's series arrives, emit its floor-aligned grid points with
    as-of forward fill — state per entity is 24 bytes (next grid ts,
    last value, last source ts), bounded by the key count, never the
    stream. A grid point is FINALIZED the moment a later observation
    (or an equal-ts one) arrives, so over any time-ordered prefix the
    emitted set equals the batch operator's output on the same prefix
    (duality test in tests/test_stateful.py). Per-entity arrival must
    be time-ordered — the same contract as the other twins here; out-
    of-order feeds need an upstream watermark sort.

    Batch frames route to the batch operator directly.
    """
    if not df.isStreaming:
        from pixie_spark.operators.timeseries import resample_ffill

        return resample_ffill(
            df, step, entity_col=entity_col, ts_col=ts_col,
            value_col=value_col, max_fill_steps=max_fill_steps,
        )

    out_schema = resample_schema(df.schema[entity_col])
    horizon = None if max_fill_steps is None else int(max_fill_steps) * int(step)
    stp = int(step)

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            next_grid, cur_val, cur_src = state.get
            if pd.isna(cur_val):
                cur_val = None
            if cur_src is not None and pd.isna(cur_src):
                cur_src = None
        else:
            next_grid, cur_val, cur_src = None, None, None
        ents, tss, vals, fills = [], [], [], []

        def emit(g: int) -> None:
            ok = cur_src is not None and (horizon is None or g - cur_src <= horizon)
            v = float(cur_val) if ok else None
            ents.append(key[0])
            tss.append(g)
            vals.append(v)
            fills.append(v is not None and cur_src != g)

        for pdf in pdfs:
            for _, row in pdf.sort_values(ts_col).iterrows():
                t, v = int(row[ts_col]), float(row[value_col])
                if next_grid is None:
                    next_grid = (t // stp) * stp
                while next_grid < t:
                    emit(next_grid)
                    next_grid += stp
                cur_val, cur_src = v, t
                while next_grid <= t:  # the grid point AT the obs ts
                    emit(next_grid)
                    next_grid += stp
        state.update((next_grid, cur_val, cur_src))
        yield pd.DataFrame(
            {entity_col: ents, "ts": tss, "value": vals, "filled": fills}
        )

    return df.groupBy(entity_col).applyInPandasWithState(
        update, out_schema, _RESAMPLE_STATE, "append", GroupStateTimeout.NoTimeout
    )
