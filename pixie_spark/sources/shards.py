"""Training-shard writer: the output stage of a training-data pipeline.

Samplers and loaders (webdataset/tf.data-style) want the cleaned corpus
as fixed-size shards in a deterministic random order — globally
shuffled so each shard is an unbiased corpus sample, sized so one shard
is one loader work unit, reproducible so a rerun of the pipeline bit-
for-bit recreates the same shard layout (training-run provenance).

The reference engine has no durable output stage at all (results stream
back to the client — src/carnot/exec/grpc_sink_node.cc); this extends
the managed-sink family (sources/sink.py) with the shape LLM training
jobs consume.

Spark-first mechanics:

- The "random" order is a seeded hash of the document id — a
  deterministic permutation, not an RNG, so the layout is reproducible
  across runs AND engines (the same trick the sampling family uses).
- Exact fixed-size shards need a GLOBAL rank, and the naive
  ``row_number() OVER (ORDER BY key)`` collapses the corpus through one
  task (Exchange SinglePartition). Instead: two-phase ranking —
  range-partition by the hash key, count rows per partition (one
  bounded collect of n_partitions longs), convert counts to prefix
  offsets, and add each partition's offset to its LOCAL row_number.
  Every stage is per-partition parallel; the only global object is the
  n_partitions-entry offset map riding along as a broadcast join.
- Each output shard is one directory (``shard=K/``) written by one
  task: ranks are contiguous within a range partition, so hashing the
  derived shard id re-clusters rows one-task-per-shard.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pixie_spark.materialize import materialize

SHARD_COL = "shard"


def global_rank(
    df: DataFrame,
    key,
    n_partitions: int | None = None,
    rank_col: str = "rank",
) -> DataFrame:
    """0-based dense global rank of every row under ORDER BY ``key``,
    without ever funneling the data through one task.

    ``key`` is a Column (ties broken arbitrarily-but-deterministically
    by the range partitioner; pass a unique key for a total order).
    Plan: one range-exchange + per-partition sort + per-partition
    window; the cross-partition coordination is an n_partitions-row
    collect turned into a broadcast offset map.
    """
    if n_partitions is None:
        n_partitions = df.sparkSession.sparkContext.defaultParallelism
    keyed = df.withColumn("__key", key)
    # localCheckpoint pins the partition layout: the counts collect and
    # the ranked output MUST see identical __pid assignments, and a
    # recomputed range exchange could re-sample boundaries.
    parts = (
        keyed.repartitionByRange(n_partitions, "__key")
        .withColumn("__pid", F.spark_partition_id())
        .transform(materialize)
    )
    counts = {r["__pid"]: r["n"] for r in parts.groupBy("__pid").agg(F.count(F.lit(1)).alias("n")).collect()}
    offsets, acc = [], 0
    for pid in sorted(counts):
        offsets.append((pid, acc))
        acc += counts[pid]
    off_df = df.sparkSession.createDataFrame(offsets, "__pid int, __off long")
    w = Window.partitionBy("__pid").orderBy("__key")
    return (
        parts.join(F.broadcast(off_df), "__pid")
        .withColumn(rank_col, F.col("__off") + F.row_number().over(w) - 1)
        .drop("__pid", "__off", "__key")
    )


def global_prefix_sum(
    df: DataFrame,
    value_col: str,
    order_col: str,
    out_col: str = "cum_prev",
    n_partitions: int | None = None,
) -> DataFrame:
    """EXCLUSIVE global prefix sum of ``value_col`` under ORDER BY
    ``order_col`` — the distributed two-phase scan, same shape as
    :func:`global_rank`: range-partition on the order key, collect one
    per-partition SUM (bounded: n_partitions longs), convert to prefix
    offsets, add each partition's offset to its local exclusive window
    cumsum. No Exchange SinglePartition anywhere.

    Exclusive means row i's ``out_col`` = sum of values of all rows
    strictly before it in the order — the running-total form sequence
    packing needs (a row's own weight lands it in the pack its PREFIX
    filled up to)."""
    if n_partitions is None:
        n_partitions = df.sparkSession.sparkContext.defaultParallelism
    parts = (
        df.repartitionByRange(n_partitions, order_col)
        .withColumn("__pid", F.spark_partition_id())
        .transform(materialize)  # pin layout: sums collect + ranked output must agree
    )
    sums = {
        r["__pid"]: r["s"]
        for r in parts.groupBy("__pid")
        .agg(F.sum(F.col(value_col).cast("long")).alias("s"))
        .collect()
    }
    offsets, acc = [], 0
    for pid in sorted(sums):
        offsets.append((pid, acc))
        acc += int(sums[pid] or 0)
    off_df = df.sparkSession.createDataFrame(offsets or [(0, 0)], "__pid int, __off long")
    w = (
        Window.partitionBy("__pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = F.coalesce(F.sum(F.col(value_col).cast("long")).over(w), F.lit(0))
    return (
        parts.join(F.broadcast(off_df), "__pid")
        .withColumn(out_col, F.col("__off") + local)
        .drop("__pid", "__off")
    )


def assign_shards(
    df: DataFrame,
    shard_rows: int,
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Deterministic globally-shuffled shard assignment: permutation
    order = xxhash64(id, seed), shard = global_rank // shard_rows.
    Every shard holds exactly ``shard_rows`` rows except the last."""
    ranked = global_rank(df, F.xxhash64(F.col(id_col), F.lit(seed)))
    # integral div, not `/`+cast: double division is exact only below
    # 2^53 and rank is non-negative, so `div` IS floor here — the same
    # discipline as the sink/rollup/resample bucket floors
    return ranked.withColumn(
        SHARD_COL, F.expr(f"rank div {int(shard_rows)}")
    ).drop("rank")


def write_training_shards(
    df: DataFrame,
    path: str,
    shard_rows: int,
    id_col: str = "doc_id",
    seed: int = 42,
) -> int:
    """Write fixed-size deterministic shards under ``path`` as
    ``shard=K/`` parquet directories; returns the shard count.

    The pre-write ``repartition(shard)`` clusters each shard into one
    task so a shard is one file (plus the parquet footer contract
    loaders expect); AQE may coalesce several SMALL shards into one
    task, which still yields one file per shard directory.
    """
    assigned = assign_shards(df, shard_rows, id_col, seed)
    n = assigned.select(F.max(SHARD_COL)).first()[0]
    n_shards = int(n) + 1 if n is not None else 0
    (
        assigned.repartition(n_shards or 1, SHARD_COL)
        .write.mode("overwrite")
        .partitionBy(SHARD_COL)
        .parquet(path)
    )
    return n_shards


def read_training_shards(
    spark: SparkSession, path: str, shards: list[int] | None = None
) -> DataFrame:
    """Read shards back; ``shards`` prunes to the named shard
    directories via a partition-column filter (a loader reading its
    worker's slice)."""
    df = spark.read.parquet(path)
    if shards is not None:
        df = df.where(F.col(SHARD_COL).isin([int(s) for s in shards]))
    return df


def expected_shard_count(n_rows: int, shard_rows: int) -> int:
    return math.ceil(n_rows / shard_rows) if n_rows else 0


def materialize_mixture(
    sources: dict[str, DataFrame],
    path: str,
    target_total: int,
    shard_rows: int,
    temperature: float = 2.0,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 42,
) -> int:
    """End-to-end mixture materialization: named corpora → temperature-
    sampled selection → deterministic fixed-size shards on disk.
    Returns the shard count.

    This is the last mile of the training pipeline: the mixing step
    (operators/sampling.temperature_mix — T>1 upweights tail domains)
    decides WHAT goes in; the global hash permutation decides WHERE it
    lands, so every shard is an unbiased sample of the final mixture
    (per-shard source proportions ≈ global proportions — tested) and a
    loader can train on shards in any order without a separate shuffle
    pass.

    Rows are re-keyed by xxhash64(source, id) so ids colliding across
    sources stay distinct; each shard row carries (mix_id, source,
    id_col, text_col). Selection and placement both derive from seeded
    hashes — the whole materialization replays bit-for-bit.
    """
    from pixie_spark.operators.sampling import temperature_mix

    parts = [
        df.select(
            F.lit(name).alias("source"),
            F.col(id_col),
            F.col(text_col),
            F.xxhash64(F.lit(name), F.col(id_col)).alias("mix_id"),
        )
        for name, df in sources.items()
    ]
    unioned = parts[0]
    for p in parts[1:]:
        unioned = unioned.unionByName(p)
    mixed = temperature_mix(unioned, "source", target_total, temperature, seed)
    return write_training_shards(mixed, path, shard_rows, id_col="mix_id", seed=seed)
