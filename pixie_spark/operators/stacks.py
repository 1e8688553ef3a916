"""Stack-trace aggregation (flamegraph folding).

Reference: the stack_traces.beta table + pprof export
(src/carnot/funcs/builtins/pprof_ops.cc) and the
px/differential_flamegraph script family. A stack sample is a
';'-separated frame string (folded format) with a sample count.

- fold_stacks:    per-prefix sample totals — the flamegraph tree as a
                  table (one explode + one hash agg; no driver-side tree
                  building, works on billions of samples).
- differential:   per-prefix count delta between two sample sets
                  (before/after), the differential-flamegraph core.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fold_stacks(
    df: DataFrame, stack_col: str = "stack", count_col: str = "count"
) -> DataFrame:
    """(prefix, depth, samples): total samples passing through every
    stack prefix. Prefixes are rebuilt with slice+concat_ws from the
    split frames — all codegen expressions."""
    frames = F.split(F.col(stack_col), ";")
    exploded = df.select(
        frames.alias("__frames"),
        F.col(count_col).alias("__n"),
        F.explode(F.sequence(F.lit(1), F.size(frames))).alias("depth"),
    )
    prefix = F.concat_ws(";", F.slice("__frames", 1, F.col("depth")))
    return (
        exploded.select(prefix.alias("prefix"), "depth", "__n")
        .groupBy("prefix", "depth")
        .agg(F.sum("__n").alias("samples"))
    )


def differential_flamegraph(
    before: DataFrame,
    after: DataFrame,
    stack_col: str = "stack",
    count_col: str = "count",
) -> DataFrame:
    """Per-prefix delta (after - before) of folded sample counts — the
    px/differential_flamegraph computation: full outer join of the two
    folded trees on the prefix."""
    b = fold_stacks(before, stack_col, count_col).withColumnRenamed("samples", "samples_before")
    a = fold_stacks(after, stack_col, count_col).withColumnRenamed("samples", "samples_after")
    return (
        b.join(a, ["prefix", "depth"], "full")
        .withColumn("samples_before", F.coalesce("samples_before", F.lit(0)))
        .withColumn("samples_after", F.coalesce("samples_after", F.lit(0)))
        .withColumn("delta", F.col("samples_after") - F.col("samples_before"))
    )
