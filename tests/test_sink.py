"""Managed time-partitioned sink (sources/sink): roundtrip equality,
partition pruning on range reads, idempotent replay via dynamic
partition overwrite, small-file compaction, and bucket-granular
retention."""

import os

import pytest
from pyspark.sql import functions as F

from pixie_spark.plans import plan_string
from pixie_spark.sources import load_table
from pixie_spark.sources.sink import (
    BUCKET_COL,
    HOUR_NS,
    compact_partitions,
    expire_before,
    partition_stats,
    read_time_partitioned,
    write_time_partitioned,
)


@pytest.fixture()
def events(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


def _key_set(df):
    return {r.event_id for r in df.select("event_id").collect()}


def test_roundtrip_preserves_rows(spark, events, tmp_path):
    d = str(tmp_path / "t")
    write_time_partitioned(events, d, "ts", HOUR_NS)
    back = read_time_partitioned(spark, d, "ts", HOUR_NS)
    assert _key_set(back) == _key_set(events)
    assert back.where(F.col(BUCKET_COL) != F.expr(f"ts DIV {HOUR_NS}")).count() == 0


def test_range_read_prunes_partitions_and_bounds_rows(spark, events, tmp_path):
    d = str(tmp_path / "t")
    write_time_partitioned(events, d, "ts", HOUR_NS)
    lo = events.select(F.min("ts")).first()[0]
    start, end = lo + 2 * HOUR_NS, lo + 4 * HOUR_NS
    ranged = read_time_partitioned(spark, d, "ts", HOUR_NS, start_ns=start, end_ns=end)
    plan = plan_string(ranged)
    pf = [line for line in plan.splitlines() if "PartitionFilters" in line]
    assert any(BUCKET_COL in line for line in pf), plan
    expect = {
        r.event_id for r in events.where((F.col("ts") >= start) & (F.col("ts") < end)).collect()
    }
    assert _key_set(ranged) == expect


def test_replay_one_bucket_is_idempotent(spark, events, tmp_path):
    """Dynamic overwrite: rewriting one hour's (corrected) data replaces
    exactly that hour — no duplicates, other hours untouched."""
    d = str(tmp_path / "t")
    write_time_partitioned(events, d, "ts", HOUR_NS)
    lo = events.select(F.min("ts")).first()[0]
    bucket = lo // HOUR_NS + 1
    hour = events.where(F.expr(f"ts DIV {HOUR_NS}") == bucket)
    corrected = hour.withColumn("value", F.col("value") * 2)
    write_time_partitioned(corrected, d, "ts", HOUR_NS)  # replay
    back = read_time_partitioned(spark, d, "ts", HOUR_NS)
    assert _key_set(back) == _key_set(events)  # no dupes, nothing lost
    v_new = back.where(F.col(BUCKET_COL) == bucket).select(F.sum("value")).first()[0]
    v_old = hour.select(F.sum("value")).first()[0]
    assert v_new == pytest.approx(2 * v_old)


def test_compaction_reduces_files_preserves_data(spark, events, tmp_path):
    d = str(tmp_path / "t")
    # a few hours is enough — compaction runs one rewrite per fat bucket
    lo = events.select(F.min("ts")).first()[0]
    events = events.where(F.col("ts") < lo + 4 * HOUR_NS).localCheckpoint()
    # simulate streaming appends: several small writes
    for i in range(3):
        write_time_partitioned(
            events.where(F.col("event_id") % 3 == i), d, "ts", HOUR_NS, mode="append"
        )
    before = {r.time_bucket: r.n_files for r in partition_stats(spark, d).collect()}
    assert max(before.values()) >= 3
    fat = [b for b, n in before.items() if n > 2]
    done = compact_partitions(spark, d, target_files=1)
    assert sorted(done) == sorted(fat)
    after = {r.time_bucket: r.n_files for r in partition_stats(spark, d).collect()}
    assert all(after[b] == 1 for b in done)
    back = read_time_partitioned(spark, d, "ts", HOUR_NS)
    assert _key_set(back) == _key_set(events)


def test_expire_before_drops_only_old_buckets(spark, events, tmp_path):
    d = str(tmp_path / "t")
    write_time_partitioned(events, d, "ts", HOUR_NS)
    lo = events.select(F.min("ts")).first()[0]
    cutoff = (lo // HOUR_NS + 2) * HOUR_NS  # first two buckets fully old
    expired = expire_before(d, cutoff, HOUR_NS)
    assert expired == [lo // HOUR_NS, lo // HOUR_NS + 1]
    back = read_time_partitioned(spark, d, "ts", HOUR_NS)
    expect = {r.event_id for r in events.where(F.col("ts") >= cutoff).collect()}
    assert _key_set(back) == expect
    # straddling/new buckets untouched on disk
    assert all(b not in expired for b in
               {r.time_bucket for r in partition_stats(spark, d).collect()})


def test_partition_stats_shape(spark, events, tmp_path):
    d = str(tmp_path / "t")
    write_time_partitioned(events, d, "ts", HOUR_NS)
    stats = partition_stats(spark, d).collect()
    assert len(stats) == len([n for n in os.listdir(d) if n.startswith(BUCKET_COL)])
    assert all(r.n_files >= 1 and r.bytes > 0 for r in stats)


def test_bucket_assignment_exact_at_ns_epoch_boundaries(spark):
    """int64 ns-epoch exceeds 2^53: double division rounds, which would
    file a row within ~256 ns of an hour edge into the WRONG partition
    (and dynamic-overwrite replay would then rewrite the wrong bucket).
    The integral-div bucket must put boundary-1ns in the EARLIER bucket
    and the exact boundary in the LATER one."""
    from pixie_spark.sources.sink import HOUR_NS, with_bucket

    edge = (1_700_000_000_123_456_789 // HOUR_NS + 1) * HOUR_NS
    rows = [(edge - 1, "before"), (edge, "at"), (edge + 1, "after")]
    df = spark.createDataFrame(rows, "ts long, tag string")
    got = {r["tag"]: r["time_bucket"] for r in with_bucket(df, "ts", HOUR_NS).collect()}
    assert got["before"] == edge // HOUR_NS - 1
    assert got["at"] == got["after"] == edge // HOUR_NS
