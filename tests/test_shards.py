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


def test_materialize_mixture_shards_are_unbiased(spark, tmp_path):
    """Per-shard source proportions track the global mixture proportions
    — the property that lets a loader train on shards in any order."""
    from pixie_spark.sources.shards import materialize_mixture

    head = _docs(spark, 2000)  # big "web" domain
    tail = _docs(spark, 200)   # small "books" domain
    n = materialize_mixture(
        {"web": head, "books": tail},
        str(tmp_path / "mix"),
        target_total=1000,
        shard_rows=200,
        temperature=2.0,
    )
    back = read_training_shards(spark, str(tmp_path / "mix"))
    total = back.count()
    assert abs(total - 1000) < 150  # expected kept total ≈ target
    global_books = back.where(F.col("source") == "books").count() / total
    # T=2 upweights the tail domain well beyond its 1/11 proportional share
    assert global_books > 0.15
    per_shard = (
        back.groupBy("shard")
        .agg(
            F.avg((F.col("source") == "books").cast("double")).alias("frac"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    assert len(per_shard) == n
    for r in per_shard:
        if r["n"] >= 150:  # full shards only; the ragged tail shard is noisier
            assert abs(r["frac"] - global_books) < 0.12


def test_materialize_mixture_replays_identically(spark, tmp_path):
    from pixie_spark.sources.shards import materialize_mixture

    a_dir, b_dir = str(tmp_path / "a"), str(tmp_path / "b")
    srcs = {"x": _docs(spark, 300), "y": _docs(spark, 100)}
    materialize_mixture(srcs, a_dir, target_total=200, shard_rows=50)
    materialize_mixture(srcs, b_dir, target_total=200, shard_rows=50)
    a = {(r["mix_id"], r["shard"]) for r in read_training_shards(spark, a_dir).collect()}
    b = {(r["mix_id"], r["shard"]) for r in read_training_shards(spark, b_dir).collect()}
    assert a == b


def test_materialize_mixture_distinct_ids_across_sources(spark, tmp_path):
    """Same doc_id in two sources must stay two rows (re-keyed mix_id)."""
    from pixie_spark.sources.shards import materialize_mixture

    srcs = {"x": _docs(spark, 50), "y": _docs(spark, 50)}  # identical id ranges
    materialize_mixture(srcs, str(tmp_path / "m"), target_total=100, shard_rows=40)
    back = read_training_shards(spark, str(tmp_path / "m"))
    assert back.select("mix_id").distinct().count() == back.count()


def test_global_prefix_sum_matches_python(spark):
    from pixie_spark.sources.shards import global_prefix_sum

    rows = [(i, (i * 37) % 11 + 1) for i in range(200)]
    df = spark.createDataFrame(rows, "k long, v long")
    out = {r["k"]: r["cum_prev"] for r in global_prefix_sum(df, "v", "k", n_partitions=7).collect()}
    acc = 0
    for k, v in rows:  # rows already in k order
        assert out[k] == acc
        acc += v


def test_sequence_packing_has_no_single_partition_exchange(spark):
    """The round-4 rewrite's contract: packing's running total is the
    two-phase scan, not a global window."""
    from pixie_spark.operators.sampling import sequence_packing

    df = spark.range(100).select(F.col("id").alias("doc_id"), (F.col("id") % 7 + 1).alias("tok"))
    plan = (
        sequence_packing(df, "tok", 16, "doc_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange SinglePartition" not in plan
