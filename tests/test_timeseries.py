"""Time-series pattern search + rolling anomalies
(operators/timeseries.py) vs numpy references; planted-shape recovery;
plan contracts (no Python, TakeOrdered top-k)."""

import math

import numpy as np
import pyspark.sql.functions as F
import pytest

from pixie_spark.operators.timeseries import (
    _znorm_pattern,
    pattern_search,
    rolling_anomalies,
)


def _series_df(spark, series: dict[str, list[float]]):
    rows = [(e, t, float(v)) for e, vs in series.items() for t, v in enumerate(vs)]
    return spark.createDataFrame(rows, "entity string, ts long, value double")


def _np_dists(vs, pattern):
    zq = np.array(_znorm_pattern(pattern))
    m = len(pattern)
    out = {}
    for i in range(len(vs) - m + 1):
        w = np.array(vs[i : i + m], dtype=float)
        sd = w.std()
        if sd == 0:
            out[i] = math.inf
        else:
            zw = (w - w.mean()) / sd
            out[i] = float(((zw - zq) ** 2).sum())
    return out


def test_pattern_search_matches_numpy_reference(spark):
    rng = np.random.default_rng(4)
    series = {"a": list(rng.normal(size=60)), "b": list(rng.normal(size=45))}
    pattern = [0.0, 1.0, 3.0, 1.0, 0.0]
    got = pattern_search(_series_df(spark, series), pattern, k=12).collect()
    expect = {}
    for e, vs in series.items():
        for i, d in _np_dists(vs, pattern).items():
            expect[(e, i)] = d
    best = sorted(expect.items(), key=lambda kv: (kv[1], kv[0]))[:12]
    assert [(r["entity"], r["ts"]) for r in got] == [k for k, _ in best]
    for r, (_, d) in zip(got, best):
        assert r["dist"] == pytest.approx(d, rel=1e-9)
    assert [r["rank"] for r in got] == list(range(1, 13))


def test_pattern_search_finds_planted_shape_amplitude_invariant(spark):
    """The same spike shape planted at 10x amplitude in another entity
    must match equally well (z-normalization)."""
    base = [5.0] * 30
    spike = [0.0, 2.0, 6.0, 2.0, 0.0]
    a = base[:10] + [v + 1.0 for v in spike] + base[15:]          # small spike
    b = base[:20] + [10 * v + 50.0 for v in spike] + base[25:]    # huge spike
    df = _series_df(spark, {"small": a, "huge": b})
    got = pattern_search(df, spike, k=2).collect()
    hits = {(r["entity"], r["ts"]) for r in got}
    assert hits == {("small", 10), ("huge", 20)}
    assert got[0]["dist"] == pytest.approx(0.0, abs=1e-18)
    assert got[1]["dist"] == pytest.approx(0.0, abs=1e-18)


def test_pattern_search_no_python_in_plan(spark):
    df = _series_df(spark, {"a": [1.0, 2.0, 3.0, 4.0, 5.0]})
    plan = (
        pattern_search(df, [0.0, 1.0, 0.0], k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan


def test_rolling_anomalies_matches_numpy(spark):
    rng = np.random.default_rng(9)
    vs = list(rng.normal(loc=10, scale=1, size=50))
    vs[30] = 30.0  # planted spike
    df = _series_df(spark, {"a": vs})
    out = {r["ts"]: r for r in rolling_anomalies(df, baseline_rows=20, min_support=8).collect()}
    flagged = {t for t, r in out.items() if r["is_anomaly"]}
    assert 30 in flagged
    for t, r in out.items():
        lo = max(0, t - 20)
        base = np.array(vs[lo:t])
        assert r["baseline_n"] == len(base)
        if len(base) >= 8 and base.std() > 0:
            z = (vs[t] - base.mean()) / base.std()
            assert r["z"] == pytest.approx(float(z), rel=1e-9)
            assert r["is_anomaly"] == (abs(z) >= 3.0)
        else:
            assert r["z"] is None and not r["is_anomaly"]


def test_rolling_anomalies_spike_does_not_flag_recovery(spark):
    """After the spike, the baseline absorbs it — the return to normal
    must not cascade into more flags than the spike itself."""
    vs = [10.0] * 30 + [100.0] + [10.0] * 30
    df = _series_df(spark, {"a": vs})
    out = rolling_anomalies(df, baseline_rows=20, min_support=8).collect()
    flags = [r["ts"] for r in out if r["is_anomaly"]]
    assert flags[0] == 30
    assert len(flags) <= 3  # the spike + at most the immediate shadow


def test_flat_baseline_jump_flagged_without_z(spark):
    df = _series_df(spark, {"a": [5.0] * 15 + [50.0]})
    out = {r["ts"]: r for r in rolling_anomalies(df, min_support=8).collect()}
    # flat baseline: sd == 0 → no z value, but the jump still flags
    assert out[15]["z"] is None and out[15]["is_anomaly"]
    # continuing the constant does not flag
    assert not out[14]["is_anomaly"]
    for t in range(8):  # warm-up
        assert not out[t]["is_anomaly"]


def test_rolling_anomalies_chunked_bit_identical(spark):
    """Round-8 verdict #5: the low-cardinality fallback (per-(entity,
    block) trailing moments with boundary context) must be BIT-identical
    to the single-window path — same rows, same order, same float
    accumulation — across multiple entities and many blocks, including
    warm-up rows, a planted spike, and a flat-baseline jump."""
    rng = np.random.default_rng(17)
    series = {
        "a": list(rng.normal(loc=10, scale=1, size=600)),  # skew: 5-120x its peers
        "b": list(rng.normal(loc=5, scale=2, size=333)),
        "c": [7.0] * 40 + [70.0] + [7.0] * 29,  # flat baseline + jump
        "d": [1.0, 2.0, 3.0, 4.0, 5.0],  # shorter than baseline_rows
        "e": list(rng.normal(loc=0, scale=1, size=16)),  # exactly one block
        "f": list(rng.normal(loc=0, scale=1, size=17)),  # one block + 1 boundary row
    }
    series["a"][300] = 99.0  # planted spike mid-block
    df = _series_df(spark, series)
    kw = dict(baseline_rows=7, min_support=4, z_threshold=3.0)
    base = rolling_anomalies(df, chunked=False, **kw).collect()
    chunked = rolling_anomalies(df, chunked=True, chunk_rows=16, **kw).collect()
    assert [r.asDict() for r in sorted(base, key=lambda r: (r["entity"], r["ts"]))] == [
        r.asDict() for r in sorted(chunked, key=lambda r: (r["entity"], r["ts"]))
    ]
    # identical column order too — callers select positionally
    assert base[0].__fields__ == chunked[0].__fields__
    # sanity: the fallback really split into many blocks (600/16 ≈ 37)
    assert len({r["ts"] // 16 for r in chunked if r["entity"] == "a"}) > 30


def test_rolling_anomalies_chunked_plan_parallelism(spark):
    """The whole point of the fallback: the trailing-moments window must
    partition by (entity, block), not by entity alone — otherwise the
    sf1 shape (5 entities, 1M rows) still runs on 5 partitions."""
    vs = list(range(100))
    df = _series_df(spark, {"a": [float(v) for v in vs]})
    out = rolling_anomalies(df, chunked=True, chunk_rows=16,
                            baseline_rows=7, min_support=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    import re

    # the trailing-moment windows must carry (entity, __blk) in their
    # windowspecdefinition partition keys
    specs = re.findall(r"stddev_pop\(\w+#?\d*\) windowspecdefinition\(([^)]*)\)", plan)
    assert specs, plan[:2000]
    for spec in specs:
        assert "__blk" in spec and "entity" in spec, spec


def test_rolling_anomalies_auto_probe_small_data(spark):
    """Auto mode must pick the single-window path on small/high-card
    data (no behavior change for every existing caller) — and still
    return the same answer."""
    vs = [10.0] * 12 + [50.0]
    df = _series_df(spark, {"a": vs, "b": vs})
    auto = rolling_anomalies(df, min_support=8).collect()
    base = rolling_anomalies(df, min_support=8, chunked=False).collect()
    key = lambda r: (r["entity"], r["ts"])
    assert sorted(map(str, auto)) == sorted(map(str, base))
    assert {key(r) for r in auto if r["is_anomaly"]} == {("a", 12), ("b", 12)}


def _py_resample(rows, step, max_fill_steps=None):
    """Serial reference: per entity, floor-aligned grid, as-of forward
    fill with optional staleness horizon."""
    out = {}
    by_e = {}
    for e, t, v in rows:
        by_e.setdefault(e, []).append((t, v))
    for e, obs in by_e.items():
        obs.sort()
        lo = (obs[0][0] // step) * step
        hi = (obs[-1][0] // step) * step
        for g in range(lo, hi + 1, step):
            prior = [(t, v) for t, v in obs if t <= g]
            if not prior:
                out[(e, g)] = (None, False)
                continue
            t, v = prior[-1]
            if max_fill_steps is not None and g - t > max_fill_steps * step:
                out[(e, g)] = (None, False)
            else:
                out[(e, g)] = (v, t != g)
    return out


def test_resample_ffill_matches_python(spark):
    from pixie_spark.operators.timeseries import resample_ffill

    rows = [
        ("a", 103, 1.0), ("a", 215, 2.0), ("a", 230, 3.0), ("a", 480, 4.0),
        ("b", 95, 10.0), ("b", 400, 20.0),
    ]
    df = _series_df(spark, {})  # empty helper not usable; build directly
    df = spark.createDataFrame(rows, "entity string, ts long, value double")
    got = {
        (r["entity"], r["ts"]): (r["value"], r["filled"])
        for r in resample_ffill(df, step=100).collect()
    }
    assert got == _py_resample(rows, 100)


def test_resample_ffill_staleness_horizon(spark):
    from pixie_spark.operators.timeseries import resample_ffill

    rows = [("a", 0, 1.0), ("a", 1000, 2.0)]
    df = spark.createDataFrame(rows, "entity string, ts long, value double")
    got = {
        r["ts"]: r["value"]
        for r in resample_ffill(df, step=100, max_fill_steps=3).collect()
    }
    assert got[0] == 1.0 and got[100] == 1.0 and got[300] == 1.0
    assert got[400] is None and got[900] is None  # stale: > 3 steps old
    assert got[1000] == 2.0
    assert got == {
        t: v for (_, t), (v, _) in _py_resample(rows, 100, max_fill_steps=3).items()
    }


def test_resample_ffill_one_shuffle(spark):
    from pixie_spark.operators.timeseries import resample_ffill

    df = spark.createDataFrame([("a", 1, 1.0)], "entity string, ts long, value double")
    plan = resample_ffill(df, 10)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan
    assert "EvalPython" not in plan


def test_resample_ffill_ns_epoch_exact_boundaries(spark):
    # int64 ns-epoch timestamps exceed 2^53: double division rounds the
    # quotient and floor() lands one grid step off near boundaries.
    # min ts = boundary-1ns must still include the grid point BELOW it.
    from pixie_spark.operators.timeseries import resample_ffill

    step = 1_000_000_000  # 1s in ns
    base = 1_700_000_000_123_456_789  # > 2^53, not grid-aligned
    lo_grid = (base // step) * step
    rows = [("e", base, 1.0), ("e", base + 3 * step, 2.0)]
    df = spark.createDataFrame(rows, "entity string, ts long, value double")
    got = sorted(r["ts"] for r in resample_ffill(df, step=step).collect())
    expect = [lo_grid + i * step for i in range(0, 4)]
    assert got == expect, f"grid off: {got[:2]}… vs {expect[:2]}…"
    # and the adversarial boundary-1ns min: the floor must go DOWN
    rows2 = [("e", lo_grid + step - 1, 1.0), ("e", lo_grid + 2 * step, 2.0)]
    df2 = spark.createDataFrame(rows2, "entity string, ts long, value double")
    got2 = sorted(r["ts"] for r in resample_ffill(df2, step=step).collect())
    assert got2[0] == lo_grid  # first grid point not dropped


def test_pattern_search_duplicate_ts_collapse_convention(spark):
    """lead()-window subsequences are only well-defined over UNIQUE
    (entity, ts) points — the equal-ts interleave is arbitrary, so
    duplicate ingest rows make window contents engine/order-dependent
    (the defect the sf1 gate sweep caught). Since round 8 the operator
    collapses duplicates itself — min(value) per (entity, ts), inside
    pattern_scores (round-7 advice) — so a RAW 10x-duplicated series
    must reproduce the unique series' top-k exactly, with no caller
    discipline; an explicitly pre-collapsed frame stays a no-op."""
    rng = np.random.RandomState(7)
    series = {"click": list(rng.rand(60)), "view": list(rng.rand(60))}
    uniq = _series_df(spark, series)
    dup10 = uniq
    for _ in range(9):
        dup10 = dup10.union(uniq)
    collapsed = dup10.groupBy("entity", "ts").agg(
        F.min("value").alias("value")
    )
    pattern = [0.0, 1.0, 3.0, 1.0, 0.0]

    def rows(df):
        return [
            (r["entity"], r["ts"], round(r["dist"], 9), r["rank"])
            for r in pattern_search(df, pattern, k=10).collect()
        ]

    assert rows(collapsed) == rows(uniq)
    # the operator-internal collapse: raw duplicated input, same answer
    assert rows(dup10) == rows(uniq)


def test_rolling_anomalies_chunked_rejects_streaming(spark):
    """r10 ADVICE: explicit chunked=True on a streaming frame used to
    bypass the materialize cut and the bad-key guard, failing three
    joins deep with release pointing at a never-persisted frame. The
    limitation must be named up front, pointing at the streaming twin."""
    import pytest as _pytest

    from pixie_spark.operators.timeseries import rolling_anomalies

    sdf = (
        spark.readStream.format("rate").load()
        .selectExpr("'e' as entity", "timestamp as ts", "value")
    )
    with _pytest.raises(ValueError, match="streaming_anomalies"):
        rolling_anomalies(sdf, chunked=True)
