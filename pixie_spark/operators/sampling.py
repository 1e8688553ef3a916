"""Sampling & packing operators for training-data pipelines.

- stratified_downsample: deterministic n-per-stratum via seeded-hash
  ranking — reproducible across runs/engines (unlike Bernoulli
  sampleBy), one shuffle on the stratum key. The standard way to cap a
  dominant source in a data mixture.
- proportional_sample: seeded per-stratum Bernoulli fractions
  (df.sampleBy wrapper) for ratio-based mixing at scale where exact
  counts don't matter.
- sequence_packing: assign documents to fixed-token-budget packs by
  running cumulative sum — the streaming/contiguous packing used to
  fill context windows. Deterministic given an ordering column; packs
  at bucket boundaries may exceed the budget by < one document (greedy
  bin packing needs per-partition state; this is the shuffle-free form).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def stratified_downsample(
    df: DataFrame, stratum_col: str, n_per_stratum: int, seed: int = 42
) -> DataFrame:
    """Keep at most n rows per stratum, chosen by seeded-hash order —
    deterministic and engine-reproducible (rank by xxhash64(all columns,
    seed), tiebreak included in the hash input)."""
    w = Window.partitionBy(stratum_col).orderBy(
        F.xxhash64(F.struct(*df.columns), F.lit(seed))
    )
    return df.withColumn("__rn", F.row_number().over(w)).where(
        F.col("__rn") <= n_per_stratum
    ).drop("__rn")


def proportional_sample(
    df: DataFrame, stratum_col: str, fractions: dict, seed: int = 42
) -> DataFrame:
    """Per-stratum Bernoulli sampling (df.sampleBy) — ratio mixing."""
    return df.sampleBy(stratum_col, fractions, seed)


def sequence_packing(
    df: DataFrame,
    token_col: str,
    budget: int,
    order_col: str,
) -> DataFrame:
    """Assign each row a pack_id so consecutive rows (by order_col) fill
    ~budget tokens per pack: pack_id = exclusive-prefix-sum(tokens) DIV
    budget.

    Global window (single-partition cumsum) here; at 100 TB, compute
    per-partition prefix sums + a driver-side partition-offset pass (the
    classic two-phase scan) — the assignment formula is unchanged.
    """
    w = Window.orderBy(order_col).rowsBetween(Window.unboundedPreceding, -1)
    cum_prev = F.coalesce(F.sum(token_col).over(w), F.lit(0))
    # decimal division: cum_prev is int64 and double division misbins
    # beyond 2^53 (verified: 2^56-3 / 4096 lands one pack too high)
    return df.withColumn(
        "pack_id", F.floor(cum_prev.cast("decimal(38,0)") / budget).cast("long")
    )
