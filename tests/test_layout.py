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
        events.withColumn("hour_bucket", F.expr("time_ DIV 3600000000000"))
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
        "hour_bucket", F.expr("time_ DIV 3600000000000")
    ).write.partitionBy("hour_bucket").mode("overwrite").parquet(d)
    back = spark.read.parquet(d)
    assert back.count() == 300
    assert back.where(F.col("upid").isNull()).count() == 0


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Bucketed-by-key tables joined on that key: the plan must contain
    no Exchange (co-located join — SCALE.md shuffle discipline)."""
    import uuid

    from pixie_spark.operators.joins import write_bucketed

    # warehouse dir is a static conf — tables land in ./spark-warehouse
    # (gitignored) and are dropped below
    suffix = uuid.uuid4().hex[:8]
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    od = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    try:
        write_bucketed(li.select("l_orderkey", "l_quantity"), f"li_b_{suffix}", "l_orderkey", 8)
        write_bucketed(od.select("o_orderkey", "o_totalprice"), f"od_b_{suffix}", "o_orderkey", 8)
        a = spark.table(f"li_b_{suffix}")
        b = spark.table(f"od_b_{suffix}")
        orig_threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ path
        joined = a.join(b, a.l_orderkey == b.o_orderkey)
        plan = plan_string(joined)
        assert "Exchange" not in plan, plan
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", orig_threshold)
        spark.sql(f"DROP TABLE IF EXISTS li_b_{suffix}")
        spark.sql(f"DROP TABLE IF EXISTS od_b_{suffix}")


def test_salted_join_correctness(spark):
    """Salted join returns the same rows as a plain join on skewed data."""
    from pixie_spark.operators.joins import salted_join

    left = spark.createDataFrame(
        [(1, i) for i in range(500)] + [(2, i) for i in range(5)], ["k", "v"]
    )
    right = spark.createDataFrame([(1, "hot"), (2, "cold"), (3, "none")], ["k", "name"])
    plain = left.join(right, "k").groupBy("k", "name").count().collect()
    salted = salted_join(left, right, "k").groupBy("k", "name").count().collect()
    assert sorted(map(tuple, plain)) == sorted(map(tuple, salted))


def test_salted_join_rejects_outer(spark):
    """right/full joins would emit spurious unmatched-replica rows —
    salted_join must refuse them."""
    import pytest as _pytest

    from pixie_spark.operators.joins import salted_join

    left = spark.createDataFrame([(1, "a")], ["k", "v"])
    right = spark.createDataFrame([(1, "hot")], ["k", "name"])
    with _pytest.raises(ValueError, match="inner/left"):
        salted_join(left, right, "k", how="right")
