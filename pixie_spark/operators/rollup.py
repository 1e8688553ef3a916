"""Multi-resolution time-series rollup cascade (hypertable continuous
aggregates).

The reference engine's scripts re-aggregate raw telemetry at whatever
window the UI asks for (windowed Aggregate, agg_node.cc) — at 100 TB a
dashboard that re-scans raw events for a 1-hour view is the bottleneck.
The standard fix (TimescaleDB continuous aggregates, Druid/M3 rollup) is
a cascade of materialized resolutions where each COARSER level is
computed from the FINER level's mergeable partial state, never from raw
data:

    raw --(one scan)--> 1m partials --> 10m partials --> 1h partials

Partial state per bucket is (count, sum, min, max) — the same mergeable
UDA decomposition the reference serializes for its two-phase partial/
finalize aggregate (plan.proto:244-266) and that Catalyst emits as
partial+final HashAggregate; here the partials are reused ACROSS
materialization boundaries, so the raw table is scanned exactly once no
matter how many resolutions are materialized. Merging partials is exact
for count/sum/min/max (and avg derived at finalize): a cascaded level
equals the same aggregation computed directly from raw — asserted
against a DuckDB oracle in tests/test_rollup.py.

Scale notes:
- Each level's shuffle is on (group, bucket) keys of an already-reduced
  frame; level N+1 aggregates ~width_ratio× fewer rows, so the cascade
  cost beyond the base level is negligible.
- Levels are lazily checkpointed so materializing every resolution does
  not re-run the raw scan per consumer.
- In streaming, the same base partials come from a watermarked
  ``groupBy(window(...))`` (streaming/__init__.rolling_agg) and the
  coarser levels are identical batch merges over the sink table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pixie_spark.materialize import materialize

PARTIAL_COLS = ("n", "sum_v", "min_v", "max_v")


def _bucket(col: str, width_ns: int) -> F.Column:
    # exact integral floor-align: `/` on longs is DOUBLE division, which
    # rounds above 2^53 — ns-epoch values land one bucket off within
    # ~256 ns of a boundary (the resample_ffill lesson, ADVICE r4); the
    # double-mod form is floor-correct for any sign
    t = f"CAST({col} AS BIGINT)"
    return F.expr(f"{t} - (({t} % {width_ns} + {width_ns}) % {width_ns})")


def rollup_base(
    df: DataFrame,
    time_col: str,
    value_col: str,
    group_cols: list[str],
    width_ns: int,
    distinct_col: str | None = None,
    quantiles: bool = False,
    exact_distinct: bool = False,
) -> DataFrame:
    """Finest level: one scan of raw rows → per-(group, bucket) mergeable
    partials. Columns: group_cols + bucket_ts + (n, sum_v, min_v, max_v)
    [+ hll_v, a DataSketches HLL state for distinct-count rollup when
    ``distinct_col`` is given — countdistinct is NOT sum-mergeable, the
    sketch is what makes it cascade] [+ kll_v, a DataSketches KLL
    quantile state when ``quantiles`` — the engine-native realization of
    the reference's serialized t-digest UDA (math_sketches.h:92-129,
    Serialize/Deserialize across the PEM→Kelvin boundary): p50/p99
    cascade across materialization boundaries with the sketch's
    ~1.65% rank-error guarantee, where exact percentiles cannot merge
    at all]."""
    aggs = [
        F.count(value_col).alias("n"),
        F.sum(value_col).alias("sum_v"),
        F.min(value_col).alias("min_v"),
        F.max(value_col).alias("max_v"),
    ]
    if distinct_col is not None:
        if exact_distinct:
            # oracle-parity mode (the quantiles gate-row convention):
            # the mergeable partial is the VALUE SET itself, so every
            # cascaded level's distinct count is exact and SQL-checkable.
            # Production keeps the HLL sketch (bounded state per group);
            # this mode's state grows with true cardinality — fine for
            # gates, wrong at 100 TB.
            aggs.append(F.collect_set(distinct_col).alias("dset_v"))
        else:
            aggs.append(F.hll_sketch_agg(distinct_col).alias("hll_v"))
    if quantiles:
        aggs.append(
            F.kll_sketch_agg_double(F.col(value_col).cast("double")).alias("kll_v")
        )
    return df.groupBy(
        *group_cols, _bucket(time_col, width_ns).cast("long").alias("bucket_ts")
    ).agg(*aggs)


def rollup_merge(level: DataFrame, group_cols: list[str], width_ns: int) -> DataFrame:
    """Coarser level from a finer level's partials — raw data untouched.
    Exact for count/sum/min/max (associative-mergeable); hll_v merges by
    sketch union, which is lossless w.r.t. the sketch state (the merged
    estimate EQUALS the direct-from-raw estimate, not merely nears it)."""
    aggs = [
        F.sum("n").alias("n"),
        F.sum("sum_v").alias("sum_v"),
        F.min("min_v").alias("min_v"),
        F.max("max_v").alias("max_v"),
    ]
    if "hll_v" in level.columns:
        aggs.append(F.hll_union_agg("hll_v").alias("hll_v"))
    if "dset_v" in level.columns:
        # exact-mode merge: set union of the finer level's value sets
        aggs.append(
            F.array_distinct(F.flatten(F.collect_list("dset_v"))).alias("dset_v")
        )
    if "kll_v" in level.columns:
        aggs.append(F.kll_merge_agg_double("kll_v").alias("kll_v"))
    return level.groupBy(
        *group_cols, _bucket("bucket_ts", width_ns).cast("long").alias("bucket_ts")
    ).agg(*aggs)


def finalize(level: DataFrame) -> DataFrame:
    """Partials → user-facing aggregates (avg derived from sum/count;
    the HLL state becomes an approx distinct count and the binary sketch
    is dropped from the user-facing shape)."""
    out = level.withColumn("avg_v", F.col("sum_v") / F.col("n"))
    if "hll_v" in level.columns:
        out = out.withColumn(
            "approx_distinct", F.hll_sketch_estimate("hll_v")
        ).drop("hll_v")
    if "dset_v" in level.columns:
        out = out.withColumn(
            "approx_distinct", F.size("dset_v").cast("long")
        ).drop("dset_v")
    if "kll_v" in level.columns:
        q = F.kll_sketch_get_quantile_double(
            "kll_v", F.array(F.lit(0.5), F.lit(0.95), F.lit(0.99))
        )
        out = (
            out.withColumn("p50", q.getItem(0))
            .withColumn("p95", q.getItem(1))
            .withColumn("p99", q.getItem(2))
            .drop("kll_v")
        )
    return out


def rollup_cascade(
    df: DataFrame,
    time_col: str,
    value_col: str,
    group_cols: list[str],
    widths_ns: list[int],
    checkpoint: bool = True,
    distinct_col: str | None = None,
    quantiles: bool = False,
    exact_distinct: bool = False,
) -> dict[int, DataFrame]:
    """{width_ns: partial-state level} for an ascending width cascade.

    Each width must divide the next (bucket boundaries nest, so merging
    partials is exact); raises otherwise rather than silently producing
    buckets that straddle finer buckets.
    """
    if not widths_ns or sorted(widths_ns) != list(widths_ns):
        raise ValueError(f"widths_ns must be ascending, got {widths_ns}")
    for fine, coarse in zip(widths_ns, widths_ns[1:]):
        if coarse % fine != 0:
            raise ValueError(
                f"cascade width {coarse} is not a multiple of {fine}: coarser "
                "buckets would straddle finer ones and the partial merge "
                "would be wrong, not approximate"
            )
    levels: dict[int, DataFrame] = {}
    cur = rollup_base(
        df,
        time_col,
        value_col,
        group_cols,
        widths_ns[0],
        distinct_col=distinct_col,
        quantiles=quantiles,
        exact_distinct=exact_distinct,
    )
    if checkpoint:
        # each level feeds BOTH its consumers and the next level; without
        # a checkpoint every materialized resolution re-runs the raw scan
        cur = cur.transform(materialize, eager=False)
    levels[widths_ns[0]] = cur
    for w in widths_ns[1:]:
        cur = rollup_merge(cur, group_cols, w)
        if checkpoint:
            cur = cur.transform(materialize, eager=False)
        levels[w] = cur
    return levels


def cascade_long(levels: dict[int, DataFrame], group_cols: list[str]) -> DataFrame:
    """All resolutions as one long frame tagged by level_width_s —
    the shape a dashboard's resolution picker reads."""
    out = None
    for w, level in levels.items():
        fin = finalize(level)
        cols = ["bucket_ts", "n", "sum_v", "min_v", "max_v", "avg_v"]
        for extra in ("approx_distinct", "p50", "p95", "p99"):
            if extra in fin.columns:
                cols.append(extra)
        tagged = fin.select(
            F.lit(w // 1_000_000_000).alias("level_width_s"), *group_cols, *cols
        )
        out = tagged if out is None else out.unionByName(tagged)
    return out
