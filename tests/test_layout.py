"""Storage-layout scale contract: time-partitioned writes prune
partitions on time-range reads (the Spark replacement for the
reference's time-ordered ring-buffer cursor — SCALE.md §scans)."""

import pytest
from pyspark.sql import functions as F

from pixie_spark.plans import plan_string
from pixie_spark.sources.fixtures import http_events_fixture


def test_time_partitioned_write_prunes(spark, tmp_path):
    d = str(tmp_path / "http_events_partitioned")
    events = http_events_fixture(spark, n=500)
    # hour-bucket partition column derived from time_ (long ns)
    (
        events.withColumn("hour_bucket", (F.col("time_") / 3_600_000_000_000).cast("long"))
        .write.partitionBy("hour_bucket")
        .mode("overwrite")
        .parquet(d)
    )
    back = spark.read.parquet(d)
    one_hour = back.where(F.col("hour_bucket") == back.select(F.min("hour_bucket")).first()[0])
    plan = plan_string(one_hour)
    assert "PartitionFilters" in plan
    # the partition predicate must appear in PartitionFilters (pruning),
    # not as a post-scan filter
    pf = [line for line in plan.splitlines() if "PartitionFilters" in line]
    assert any("hour_bucket" in line for line in pf), plan
    assert one_hour.count() > 0


def test_partitioned_roundtrip_preserves_rows(spark, tmp_path):
    d = str(tmp_path / "rt")
    events = http_events_fixture(spark, n=300)
    events.withColumn(
        "hour_bucket", (F.col("time_") / 3_600_000_000_000).cast("long")
    ).write.partitionBy("hour_bucket").mode("overwrite").parquet(d)
    back = spark.read.parquet(d)
    assert back.count() == 300
    assert back.where(F.col("upid").isNull()).count() == 0
