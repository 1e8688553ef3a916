"""Regression tests for the ts-normalization layer in ``load_table``.

Round 2 lesson: the testdata fixtures switched from TIMESTAMP(NANOS) to
timestamp[us] parquet between rounds and every events consumer crashed at
analysis time. ``normalize_ts_ns`` must map ANY physical time type
(nanos-as-long, timestamp[us]/NTZ, instant) onto the engine's TIME64NS
long-ns convention — these tests fabricate each physical variant so a
future fixture change can never break silently again.
"""

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from pixie_spark.sources import load_table, normalize_ts_ns

TS_US = [1_704_067_200_000_000, 1_704_412_800_000_000, 1_705_708_799_999_999]
EXPECTED_NS = [us * 1000 for us in TS_US]


def _write(tmpdir, arrow_type, values):
    path = str(tmpdir / "events.parquet")
    tbl = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array(values, arrow_type),
            "value": pa.array([1.0, 2.0, 3.0], pa.float64()),
        }
    )
    pq.write_table(tbl, path)
    return str(tmpdir)


def test_load_table_us_ntz(spark, tmp_path):
    """timestamp[us] (no tz) → Spark TIMESTAMP_NTZ → exact long ns."""
    d = _write(tmp_path, pa.timestamp("us"), TS_US)
    df = load_table(spark, d, "events")
    assert dict(df.dtypes)["ts"] == "bigint"
    got = [r.ts for r in df.orderBy("event_id").collect()]
    assert got == EXPECTED_NS


def test_load_table_us_utc(spark, tmp_path):
    """timestamp[us, UTC] → Spark TIMESTAMP (instant) → exact long ns."""
    d = _write(tmp_path, pa.timestamp("us", tz="UTC"), TS_US)
    df = load_table(spark, d, "events")
    assert dict(df.dtypes)["ts"] == "bigint"
    got = [r.ts for r in df.orderBy("event_id").collect()]
    assert got == EXPECTED_NS


def test_load_table_nanos(spark, tmp_path):
    """TIMESTAMP(NANOS) parquet → nanosAsLong read → passthrough ns."""
    d = _write(tmp_path, pa.timestamp("ns"), [us * 1000 for us in TS_US])
    df = load_table(spark, d, "events")
    assert dict(df.dtypes)["ts"] == "bigint"
    got = [r.ts for r in df.orderBy("event_id").collect()]
    assert got == EXPECTED_NS


def test_normalize_not_cast_truncation(spark, tmp_path):
    """The µs fraction must survive — cast('long') would truncate to
    seconds; the third fixture row ends in .999999s."""
    d = _write(tmp_path, pa.timestamp("us"), TS_US)
    df = load_table(spark, d, "events")
    last = df.orderBy("event_id").collect()[-1].ts
    assert last % 1_000_000_000 == 999_999_000


def test_time_range_pushdown_on_physical_column(spark, tmp_path):
    """time_range_ns applies the predicate on the PHYSICAL timestamp so
    it reaches the parquet reader (PushedFilters on ts, not on the
    derived ns column)."""
    d = _write(tmp_path, pa.timestamp("us"), TS_US)
    lo, hi = EXPECTED_NS[1], EXPECTED_NS[2]
    df = load_table(spark, d, "events", time_range_ns=(lo, hi))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln][0]
    assert "GreaterThanOrEqual(ts" in pushed and "LessThan(ts" in pushed
    got = [r.ts for r in df.collect()]
    assert got == [EXPECTED_NS[1]]  # [lo, hi) excludes the upper bound


def test_time_range_pushdown_ltz(spark, tmp_path):
    """LTZ (instant) twin of the NTZ pushdown test: bounds are built with
    timestamp_micros(<int>) — exact integer µs, no double round-trip that
    could shift a bound by 1 µs — and still push to the reader."""
    d = _write(tmp_path, pa.timestamp("us", tz="UTC"), TS_US)
    lo, hi = EXPECTED_NS[1], EXPECTED_NS[2]
    df = load_table(spark, d, "events", time_range_ns=(lo, hi))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln][0]
    assert "GreaterThanOrEqual(ts" in pushed and "LessThan(ts" in pushed
    assert [r.ts for r in df.collect()] == [EXPECTED_NS[1]]


def test_time_range_ltz_unaligned_ns_bounds(spark, tmp_path):
    """ns bounds that aren't µs-aligned: [lo, hi) on a µs column must use
    ceil(bound/1000) — floor would admit a row 999 ns below lo."""
    d = _write(tmp_path, pa.timestamp("us", tz="UTC"), TS_US)
    # lo just above row 1's exact ns instant → row 1 excluded;
    # hi just above row 2's instant → row 2 included.
    lo, hi = EXPECTED_NS[1] + 1, EXPECTED_NS[2] + 1
    df = load_table(spark, d, "events", time_range_ns=(lo, hi))
    assert [r.ts for r in df.collect()] == [EXPECTED_NS[2]]


def test_time_range_matches_post_filter(spark, sf_dir):
    """Pushdown path ≡ filtering the normalized column (real fixtures)."""
    lo = 1_704_412_800 * 1_000_000_000
    hi = 1_705_708_800 * 1_000_000_000
    fast = load_table(spark, sf_dir, "events", time_range_ns=(lo, hi))
    slow = load_table(spark, sf_dir, "events").where(
        (F.col("ts") >= lo) & (F.col("ts") < hi)
    )
    probe = [
        "count(1) AS c",
        "min(ts) AS lo",
        "max(ts) AS hi",
        "sum(ts % 1000000000) AS frac",
    ]
    assert fast.selectExpr(*probe).collect() == slow.selectExpr(*probe).collect()


def test_normalization_tz_independent(spark, tmp_path):
    """The µs→ns mapping must not shift under a non-UTC session timezone
    (timestampdiff-from-NTZ-epoch, not unix_micros-on-NTZ)."""
    d = _write(tmp_path, pa.timestamp("us"), TS_US)
    old = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        df = load_table(spark, d, "events")
        got = [r.ts for r in df.orderBy("event_id").collect()]
        assert got == EXPECTED_NS
        lo, hi = EXPECTED_NS[1], EXPECTED_NS[2]
        ranged = load_table(spark, d, "events", time_range_ns=(lo, hi))
        assert [r.ts for r in ranged.collect()] == [EXPECTED_NS[1]]
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)


def test_empty_source_schema_and_zero_rows(spark):
    """EmptySource contract: zero rows, exactly the declared schema.
    (Rows-only in the driver gate since round 4 — this test is the
    operator's correctness evidence.)"""
    from pixie_spark.sources import empty_source

    df = empty_source(spark, "id long, name string")
    assert df.count() == 0
    assert [(f.name, f.dataType.simpleString()) for f in df.schema.fields] == [
        ("id", "bigint"),
        ("name", "string"),
    ]
    # unioning an EmptySource is the identity (ref: union with empty input)
    base = spark.createDataFrame([(1, "a")], "id long, name string")
    assert base.unionByName(df).collect() == base.collect()
    df = spark.range(3).withColumnRenamed("id", "x")
    out = normalize_ts_ns(df)
    assert out.columns == ["x"]
    assert out.count() == 3


def test_load_table_raw_int64_micros(spark, tmp_path):
    """A raw-INT64 epoch column with no parquet logical type: the unit is
    inferred from footer statistics (µs magnitude → ×1000 to ns)."""
    d = _write(tmp_path, pa.int64(), TS_US)
    df = load_table(spark, d, "events")
    got = [r.ts for r in df.orderBy("event_id").collect()]
    assert got == EXPECTED_NS


def test_load_table_raw_int64_millis_and_seconds(spark, tmp_path):
    ms = [us // 1000 for us in TS_US]
    d = _write(tmp_path, pa.int64(), ms)
    got = [r.ts for r in load_table(spark, d, "events").orderBy("event_id").collect()]
    assert got == [m * 1_000_000 for m in ms]

    secs = [us // 1_000_000 for us in TS_US]
    d2 = tmp_path / "s"
    d2.mkdir()
    d2 = _write(d2, pa.int64(), secs)
    got = [r.ts for r in load_table(spark, d2, "events").orderBy("event_id").collect()]
    assert got == [s * 1_000_000_000 for s in secs]


def test_load_table_raw_int64_nanos_passthrough(spark, tmp_path):
    d = _write(tmp_path, pa.int64(), EXPECTED_NS)
    got = [r.ts for r in load_table(spark, d, "events").orderBy("event_id").collect()]
    assert got == EXPECTED_NS


def test_raw_int64_range_filter_on_physical_values(spark, tmp_path):
    """time_range_ns over a raw-µs column: predicate lands on the raw
    values (pushable) and [lo, hi) semantics survive the scaling."""
    d = _write(tmp_path, pa.int64(), TS_US)
    lo, hi = EXPECTED_NS[1], EXPECTED_NS[2]
    df = load_table(spark, d, "events", time_range_ns=(lo, hi))
    assert [r.ts for r in df.collect()] == [EXPECTED_NS[1]]
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln][0]
    assert "GreaterThanOrEqual(ts" in pushed
