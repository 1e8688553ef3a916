"""Flamegraph folding + differential (pprof/differential_flamegraph
script family)."""

from pyspark.sql import functions as F

from pixie_spark.operators.stacks import differential_flamegraph, fold_stacks


def test_fold_stacks(spark):
    df = spark.createDataFrame(
        [
            ("main;foo;bar", 10),
            ("main;foo;baz", 5),
            ("main;qux", 3),
        ],
        ["stack", "count"],
    )
    out = {(r["prefix"], r["depth"]): r["samples"] for r in fold_stacks(df).collect()}
    assert out[("main", 1)] == 18
    assert out[("main;foo", 2)] == 15
    assert out[("main;foo;bar", 3)] == 10
    assert out[("main;qux", 2)] == 3


def test_differential_flamegraph(spark):
    before = spark.createDataFrame([("main;foo", 10), ("main;old", 4)], ["stack", "count"])
    after = spark.createDataFrame([("main;foo", 25), ("main;new", 7)], ["stack", "count"])
    out = {r["prefix"]: r for r in differential_flamegraph(before, after).collect()}
    assert out["main;foo"]["delta"] == 15
    assert out["main;new"]["samples_before"] == 0 and out["main;new"]["delta"] == 7
    assert out["main;old"]["samples_after"] == 0 and out["main;old"]["delta"] == -4
    assert out["main"]["delta"] == (25 + 7) - (10 + 4)
