"""Multi-resolution rollup cascade (operators/rollup): the core
invariant is that every CASCADED level (computed from the finer level's
partials, raw untouched) exactly equals the same aggregation computed
directly from raw rows — checked against an independent DuckDB oracle
at each resolution — plus nesting validation and the long-format view."""

import duckdb
import pytest
from pyspark.sql import functions as F

from pixie_spark.operators.rollup import (
    cascade_long,
    finalize,
    rollup_base,
    rollup_cascade,
    rollup_merge,
)
from pixie_spark.sources import load_table

WIDTHS = [60 * 10**9, 600 * 10**9, 3600 * 10**9]  # 1m → 10m → 1h


@pytest.fixture(scope="module")
def levels(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return rollup_cascade(ev, "ts", "value", ["event_type"], WIDTHS)


def _oracle(sf_dir, width_ns):
    width_us = width_ns // 1000
    return duckdb.sql(
        f"""
        SELECT event_type,
               (epoch_us(ts) // {width_us}) * {width_us} * 1000 AS bucket_ts,
               count(value) AS n, sum(value) AS sum_v,
               min(value) AS min_v, max(value) AS max_v
        FROM '{sf_dir}/events.parquet'
        GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).fetchall()


def test_every_cascaded_level_equals_direct_from_raw(spark, sf_dir, levels):
    for w in WIDTHS:
        got = {
            (r.event_type, r.bucket_ts): (r.n, r.sum_v, r.min_v, r.max_v)
            for r in levels[w].collect()
        }
        expect = {(t, b): (n, s, lo, hi) for t, b, n, s, lo, hi in _oracle(sf_dir, w)}
        assert set(got) == set(expect), f"bucket keys differ at width {w}"
        for k, (n, s, lo, hi) in expect.items():
            gn, gs, glo, ghi = got[k]
            assert gn == n and glo == lo and ghi == hi, (w, k)
            assert gs == pytest.approx(s, rel=1e-12), (w, k)


def test_finalize_avg(levels):
    row = finalize(levels[WIDTHS[0]]).first()
    assert row.avg_v == pytest.approx(row.sum_v / row.n)


def test_cascade_long_shape(levels):
    long = cascade_long(levels, ["event_type"])
    counts = {r.level_width_s: r.cnt for r in
              long.groupBy("level_width_s").agg(F.count("*").alias("cnt")).collect()}
    assert set(counts) == {60, 600, 3600}
    # coarser levels have (weakly) fewer buckets
    assert counts[60] >= counts[600] >= counts[3600]


def test_non_nesting_widths_rejected(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    with pytest.raises(ValueError, match="not a multiple"):
        rollup_cascade(ev, "ts", "value", [], [60 * 10**9, 90 * 10**9])
    with pytest.raises(ValueError, match="ascending"):
        rollup_cascade(ev, "ts", "value", [], [600 * 10**9, 60 * 10**9])


def test_base_level_only_scan_touches_raw(spark, sf_dir):
    """The coarser levels' plans read from the checkpointed finer level,
    not the parquet source — the raw table is scanned once per cascade."""
    ev = load_table(spark, sf_dir, "events")
    levels = rollup_cascade(ev, "ts", "value", ["event_type"], WIDTHS)
    plan = levels[WIDTHS[-1]]._jdf.queryExecution().executedPlan().toString()
    assert "Scan ExistingRDD" in plan or "Scan rdd" in plan.lower()
    assert "parquet" not in plan.lower()


def test_hll_distinct_cascade_equals_direct(spark, sf_dir):
    """Distinct-count rollup: the merged-sketch estimate at every coarser
    level EQUALS the direct-from-raw sketch estimate (HLL union is
    lossless over the sketch state), and tracks exact distinct counts."""
    from pixie_spark.sources import load_table

    ev = load_table(spark, sf_dir, "events")
    levels = rollup_cascade(
        ev, "ts", "value", ["event_type"], WIDTHS, distinct_col="user_id"
    )
    coarse = finalize(levels[WIDTHS[-1]])
    got = {
        (r.event_type, r.bucket_ts): r.approx_distinct for r in coarse.collect()
    }
    direct = (
        rollup_base(ev, "ts", "value", ["event_type"], WIDTHS[-1], distinct_col="user_id")
    )
    expect = {
        (r.event_type, r.bucket_ts): r.approx_distinct
        for r in finalize(direct).collect()
    }
    assert got == expect  # sketch-merge losslessness: exact equality
    exact = {
        (r.event_type, r.b): r.d
        for r in ev.groupBy(
            "event_type", F.expr(f"ts DIV {WIDTHS[-1]}").alias("bb")
        ).agg(F.countDistinct("user_id").alias("d"))
        .selectExpr("event_type", f"bb * {WIDTHS[-1]} as b", "d")
        .collect()
    }
    for k, est in got.items():
        assert abs(est - exact[k]) <= max(2, 0.05 * exact[k]), k


def test_streaming_base_level_merges_to_batch_cascade(spark, sf_dir, tmp_path):
    """Stream→rollup duality: base partials computed by Structured
    Streaming (windowed count/sum/min/max), then batch-merged one level
    up, equal the all-batch cascade — the hypertable ingestion shape
    (streaming fine level, batch continuous aggregate)."""
    import time

    from pixie_spark.sources import load_table

    ev = load_table(spark, sf_dir, "events").select("ts", "event_type", "value")
    d = str(tmp_path / "ev")
    ev.coalesce(4).write.mode("overwrite").parquet(d)

    fine, coarse = WIDTHS[0], WIDTHS[1]
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(d)
    )
    base = (
        stream.withColumn("__ts", F.timestamp_micros((F.col("ts") / 1000).cast("long")))
        .groupBy(F.window("__ts", f"{fine // 10**9} seconds"), "event_type")
        .agg(
            F.count("value").alias("n"),
            F.sum("value").alias("sum_v"),
            F.min("value").alias("min_v"),
            F.max("value").alias("max_v"),
        )
        .withColumn("bucket_ts", F.unix_micros(F.col("window.start")) * 1000)
        .drop("window")
    )
    q = (
        base.writeStream.format("memory")
        .queryName("rollup_stream_base")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        deadline = time.time() + 90
        while time.time() < deadline:
            p = q.lastProgress
            if p is not None and p.get("numInputRows", -1) == 0:
                break
            time.sleep(1)
        streamed_base = spark.table("rollup_stream_base")
        merged = rollup_merge(streamed_base, ["event_type"], coarse)
        got = {
            (r.event_type, r.bucket_ts): (r.n, round(r.sum_v, 6), r.min_v, r.max_v)
            for r in merged.collect()
        }
    finally:
        q.stop()
    batch_levels = rollup_cascade(ev, "ts", "value", ["event_type"], [fine, coarse])
    expect = {
        (r.event_type, r.bucket_ts): (r.n, round(r.sum_v, 6), r.min_v, r.max_v)
        for r in batch_levels[coarse].collect()
    }
    assert got == expect


def test_kll_quantile_state_cascades(spark):
    """Quantile rollup via KLL sketch state — the engine-native form of
    the reference's serialized t-digest UDA (math_sketches.h: Serialize/
    Deserialize across the PEM→Kelvin boundary): cascaded p50/p99 track
    the exact percentiles within the sketch's rank-error bound."""
    import numpy as np

    from pixie_spark.operators.rollup import finalize, rollup_cascade

    rng = np.random.default_rng(17)
    SEC = 10**9
    rows = [
        ("svc", int(t * SEC), float(v))
        for t, v in enumerate(rng.lognormal(mean=3.0, sigma=1.0, size=4000))
    ]
    df = spark.createDataFrame(rows, "entity string, ts long, value double")
    levels = rollup_cascade(
        df, "ts", "value", ["entity"], [60 * SEC, 600 * SEC, 3600 * SEC], quantiles=True
    )
    coarse = finalize(levels[3600 * SEC]).collect()
    vals = np.array([v for _, _, v in rows])
    by_bucket = {}
    for _, t, v in rows:
        by_bucket.setdefault((t // (3600 * SEC)) * 3600 * SEC, []).append(v)
    for r in coarse:
        exact = np.array(sorted(by_bucket[r["bucket_ts"]]))
        n = len(exact)
        for q, col in ((0.5, "p50"), (0.99, "p99")):
            # KLL default k: normalized rank error ~1.65%; allow 3% rank slack
            lo = exact[max(0, int((q - 0.03) * n) - 1)]
            hi = exact[min(n - 1, int((q + 0.03) * n))]
            assert lo <= r[col] <= hi, (r["bucket_ts"], col, r[col], lo, hi)


def test_kll_state_survives_parquet_materialization(spark, tmp_path):
    """The whole point of mergeable state: write a finer level's binary
    sketch column to parquet, read it back, merge to a coarser level —
    identical behavior to the never-materialized cascade (the
    reference's serialized-UDA-between-nodes contract, here between
    STORAGE GENERATIONS)."""
    from pixie_spark.operators.rollup import finalize, rollup_base, rollup_merge

    SEC = 10**9
    rows = [("e", int(t * SEC), float((t * 37) % 101)) for t in range(2000)]
    df = spark.createDataFrame(rows, "entity string, ts long, value double")
    base = rollup_base(df, "ts", "value", ["entity"], 60 * SEC, quantiles=True)

    p = str(tmp_path / "level_1m")
    base.write.mode("overwrite").parquet(p)
    reread = spark.read.parquet(p)
    via_disk = finalize(rollup_merge(reread, ["entity"], 600 * SEC)).collect()
    direct = finalize(rollup_merge(base, ["entity"], 600 * SEC)).collect()
    # count/sum partials merge EXACTLY through the storage roundtrip;
    # quantiles come from the sketch, whose compaction is RANDOMIZED —
    # two evaluations may differ within the rank-error bound, so the
    # quantile contract is tolerance, not equality
    exact_key = lambda rows_: {r["bucket_ts"]: (r["n"], r["sum_v"]) for r in rows_}
    assert exact_key(via_disk) == exact_key(direct)
    by_bucket = {}
    for _, t, v in rows:
        by_bucket.setdefault((t // (600 * SEC)) * 600 * SEC, []).append(v)
    for r in via_disk:
        exact = sorted(by_bucket[r["bucket_ts"]])
        n = len(exact)
        for q, col in ((0.5, "p50"), (0.99, "p99")):
            lo = exact[max(0, int((q - 0.03) * n) - 1)]
            hi = exact[min(n - 1, int((q + 0.03) * n))]
            assert lo <= r[col] <= hi, (r["bucket_ts"], col)


def test_streaming_base_partials_feed_batch_cascade(spark, tmp_path):
    """The cascade's streaming story (round-5 verdict ask #5): the BASE
    1m level is produced by an incremental Structured Streaming
    aggregation over a file stream, and the coarser 10m/1h levels are
    the ordinary BATCH merges over that streamed base — every finalized
    level must EQUAL the all-batch cascade from raw. count/sum/min/max
    are exact-mergeable; the HLL distinct state is order-insensitive,
    so the streamed sketch estimate matches the batch one exactly.
    Raw timestamps are µs-aligned: window() buckets at timestamp (µs)
    precision while the batch path buckets ns longs, so sub-µs parts
    at a bucket edge would be an artificial mismatch."""
    import pyspark.sql.functions as F

    from pixie_spark.operators.rollup import finalize, rollup_base, rollup_merge

    m = 60 * 10**9
    base_ns = 1_704_067_200_000_000_000  # far above 2^53: exercises the
    # exact integral bucket floor
    rows = []
    for i in range(600):
        etype = f"e{i % 3}"
        ts = base_ns + (i * 7919) % (90 * 60) * 10**9 + (i % 1000) * 1000
        rows.append((etype, ts, float(i % 47), i % 29))
    raw = spark.createDataFrame(rows, "etype string, ts long, value double, user_id int")

    widths = [m, 10 * m, 60 * m]
    batch_levels = {
        w: None for w in widths
    }
    batch_levels[m] = rollup_base(raw, "ts", "value", ["etype"], m, distinct_col="user_id")
    batch_levels[10 * m] = rollup_merge(batch_levels[m], ["etype"], 10 * m)
    batch_levels[60 * m] = rollup_merge(batch_levels[10 * m], ["etype"], 60 * m)

    # --- streaming base: raw laid out as 4 arrival chunks, incremental
    # windowed aggregation building the SAME partial columns
    src = tmp_path / "raw"
    for i in range(4):
        raw.where((F.col("user_id") % 4) == i).write.mode("append").parquet(str(src))
    stream = (
        spark.readStream.schema(raw.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    ts = F.timestamp_micros((F.col("ts") / 1000).cast("long"))
    streamed_base = (
        stream.withColumn("__ts", ts)
        .groupBy("etype", F.window("__ts", "1 minute").alias("__w"))
        .agg(
            F.count("value").alias("n"),
            F.sum("value").alias("sum_v"),
            F.min("value").alias("min_v"),
            F.max("value").alias("max_v"),
            F.hll_sketch_agg("user_id").alias("hll_v"),
        )
        .withColumn("bucket_ts", (F.unix_micros(F.col("__w.start")) * 1000).cast("long"))
        .drop("__w")
    )
    q = (
        streamed_base.writeStream.outputMode("complete")
        .format("memory")
        .queryName("rollup_stream_base")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    sbase = spark.table("rollup_stream_base").select(
        "etype", "bucket_ts", "n", "sum_v", "min_v", "max_v", "hll_v"
    )

    stream_levels = {m: sbase}
    stream_levels[10 * m] = rollup_merge(sbase, ["etype"], 10 * m)
    stream_levels[60 * m] = rollup_merge(stream_levels[10 * m], ["etype"], 60 * m)

    for w in widths:
        want = {
            (r["etype"], r["bucket_ts"]): (
                r["n"], r["sum_v"], r["min_v"], r["max_v"], r["approx_distinct"]
            )
            for r in finalize(batch_levels[w]).collect()
        }
        got = {
            (r["etype"], r["bucket_ts"]): (
                r["n"], r["sum_v"], r["min_v"], r["max_v"], r["approx_distinct"]
            )
            for r in finalize(stream_levels[w]).collect()
        }
        assert got == want, f"level {w // m}m diverged"
