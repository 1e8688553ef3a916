"""Training-shard writer (sources/shards.py): exact shard sizes, global
permutation correctness vs a Python reference, determinism across runs,
roundtrip integrity, and the no-single-task-sort plan contract."""

import pyspark.sql.functions as F
import pytest

from pixie_spark.sources.shards import (
    assign_shards,
    expected_shard_count,
    global_rank,
    read_training_shards,
    write_training_shards,
)


def _docs(spark, n, start=0):
    return spark.range(start, start + n).select(
        F.col("id").alias("doc_id"), F.concat(F.lit("doc "), "id").alias("text")
    )


def test_global_rank_matches_python_sort(spark):
    df = _docs(spark, 300)
    ranked = global_rank(df, F.xxhash64("doc_id", F.lit(7)), n_partitions=8).collect()
    hashed = spark.range(300).select(
        F.col("id").alias("doc_id"), F.xxhash64("id", F.lit(7)).alias("h")
    ).collect()
    order = [r["doc_id"] for r in sorted(hashed, key=lambda r: r["h"])]
    by_rank = {r["rank"]: r["doc_id"] for r in ranked}
    assert [by_rank[i] for i in range(300)] == order


def test_exact_shard_sizes(spark):
    df = _docs(spark, 1037)
    out = assign_shards(df, shard_rows=100).groupBy("shard").count().collect()
    sizes = {r["shard"]: r["count"] for r in out}
    assert len(sizes) == expected_shard_count(1037, 100) == 11
    assert all(sizes[s] == 100 for s in range(10))
    assert sizes[10] == 37


def test_assignment_deterministic_and_seed_sensitive(spark):
    df = _docs(spark, 400)
    a = {r["doc_id"]: r["shard"] for r in assign_shards(df, 50, seed=1).collect()}
    b = {r["doc_id"]: r["shard"] for r in assign_shards(df, 50, seed=1).collect()}
    c = {r["doc_id"]: r["shard"] for r in assign_shards(df, 50, seed=2).collect()}
    assert a == b
    assert a != c


def test_shards_are_unbiased_samples(spark):
    """A globally-shuffled shard must not be a contiguous id range —
    each shard mixes the corpus."""
    df = _docs(spark, 1000)
    first = [
        r["doc_id"]
        for r in assign_shards(df, 100).where(F.col("shard") == 0).collect()
    ]
    assert len(first) == 100
    spread = max(first) - min(first)
    assert spread > 500  # ids drawn from across the whole range


def test_write_read_roundtrip(spark, tmp_path):
    df = _docs(spark, 537)
    n = write_training_shards(df, str(tmp_path / "shards"), shard_rows=100)
    assert n == 6
    back = read_training_shards(spark, str(tmp_path / "shards"))
    assert back.count() == 537
    assert sorted(r["doc_id"] for r in back.collect()) == list(range(537))
    one = read_training_shards(spark, str(tmp_path / "shards"), shards=[2])
    assert one.count() == 100
    assert one.select("shard").distinct().collect()[0][0] == 2


def test_rewrite_is_identical(spark, tmp_path):
    """Provenance contract: rerunning the pipeline recreates the same
    shard membership bit-for-bit."""
    df = _docs(spark, 250)
    write_training_shards(df, str(tmp_path / "a"), shard_rows=64)
    write_training_shards(df, str(tmp_path / "b"), shard_rows=64)
    a = {(r["doc_id"], r["shard"]) for r in read_training_shards(spark, str(tmp_path / "a")).collect()}
    b = {(r["doc_id"], r["shard"]) for r in read_training_shards(spark, str(tmp_path / "b")).collect()}
    assert a == b


def test_no_single_partition_exchange(spark):
    """The whole point of two-phase ranking: the plan must not funnel
    the corpus through Exchange SinglePartition (the row_number-over-
    global-order trap)."""
    df = _docs(spark, 100)
    plan = (
        assign_shards(df, 10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange SinglePartition" not in plan


def test_empty_input(spark, tmp_path):
    df = _docs(spark, 0)
    n = write_training_shards(df, str(tmp_path / "empty"), shard_rows=10)
    assert n == 0
