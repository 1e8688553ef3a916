"""Table registration — the Spark replacement for the reference's
TableStore (src/table_store/table/table_store.h:79): a name → table map
backed by the session catalog instead of per-node in-memory stores.

At 100 TB these would be external catalog tables partitioned by a time
bucket; here we register parquet paths as temp views so both the
DataFrame API and spark.sql() resolve the same names.

Time-column convention (SURVEY §1.2): the engine-facing ``ts`` column is
ALWAYS long nanoseconds (the reference's TIME64NS = int64 ns,
src/table_store/schema/relation.h:41 resolves schemas from a declared
relation map — it never infers). Physical parquet files vary by producer:

- TIMESTAMP(NANOS)          → read natively as long ns (``nanosAsLong``)
- timestamp[us] / NTZ       → normalized via a timezone-independent
  µs-diff from epoch ×1000 (NOT ``cast("long")``, which truncates to
  seconds; NOT ``unix_micros`` on NTZ, which is tz-dependent)
- already-bigint            → passed through

so every downstream consumer can rely on ``ts`` being long ns no matter
how the fixture was written.
"""

from __future__ import annotations

import datetime
import os
from typing import Optional, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

_EPOCH = datetime.datetime(1970, 1, 1)


def _ns_to_sql_ts_literal(ns: int) -> str:
    """Long-ns epoch → ``'YYYY-MM-DD HH:MM:SS.ffffff'`` (µs precision,
    naive/UTC wall-clock). Integer arithmetic only — no float rounding."""
    dt = _EPOCH + datetime.timedelta(microseconds=ns // 1000)
    return dt.strftime("%Y-%m-%d %H:%M:%S.%f")


def normalize_ts_ns(
    df: DataFrame,
    col: str = "ts",
    time_range_ns: Optional[Tuple[int, int]] = None,
) -> DataFrame:
    """Normalize a physical time column to the engine's long-ns convention.

    When ``time_range_ns=(lo, hi)`` is given, the [lo, hi) predicate is
    applied against the PHYSICAL column type *before* normalization so it
    reaches the parquet reader as a PushedFilters entry (a predicate on
    the derived ns column would not push — Catalyst can't invert the
    µs-diff expression). Asserted in tests/test_plans.py.
    """
    dtypes = dict(df.dtypes)
    dt = dtypes.get(col)
    if dt is None:
        return df

    if dt == "timestamp_ntz":
        # NTZ wall-clock: diff from the NTZ epoch is tz-independent.
        if time_range_ns is not None:
            lo, hi = time_range_ns
            df = df.where(
                F.expr(
                    f"{col} >= TIMESTAMP_NTZ '{_ns_to_sql_ts_literal(lo)}' "
                    f"AND {col} < TIMESTAMP_NTZ '{_ns_to_sql_ts_literal(hi)}'"
                )
            )
        return df.withColumn(
            col,
            F.expr(
                f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {col})"
            )
            * F.lit(1000),
        )
    if dt == "timestamp":
        # Instant (LTZ) semantics: unix_micros is the exact epoch offset.
        if time_range_ns is not None:
            lo, hi = time_range_ns
            df = df.where(
                F.expr(
                    f"{col} >= to_timestamp({lo // 1000} * 1e-6) "
                    f"AND {col} < to_timestamp({hi // 1000} * 1e-6)"
                )
            )
        return df.withColumn(col, F.unix_micros(F.col(col)) * F.lit(1000))
    # bigint: TIMESTAMP(NANOS) parquet read via nanosAsLong — already ns.
    if time_range_ns is not None:
        lo, hi = time_range_ns
        df = df.where((F.col(col) >= F.lit(lo)) & (F.col(col) < F.lit(hi)))
    return df


def load_table(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    time_range_ns: Optional[Tuple[int, int]] = None,
) -> DataFrame:
    """MemorySource equivalent: a declarative scan. Column projection and
    time-range predicates applied downstream reach the parquet reader via
    Catalyst pushdown (ref operator: src/carnot/exec/memory_source_node.cc).

    ``ts`` is normalized to long ns regardless of the physical parquet
    type (see module docstring). Pass ``time_range_ns=(lo, hi)`` for a
    [lo, hi) scan predicate applied on the physical column so it pushes
    to the reader; filtering the returned (derived) ``ts`` later still
    works but scans all row groups.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    return normalize_ts_ns(df, "ts", time_range_ns)


def register_testdata(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every testdata table as a temp view; returns the frames."""
    out = {}
    for name in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            df = load_table(spark, sf_dir, name)
            df.createOrReplaceTempView(name)
            out[name] = df
    return out


def empty_source(spark: SparkSession, schema) -> DataFrame:
    """EmptySource operator (src/carnot/exec/empty_source_node.cc): a
    zero-row frame with a fixed schema."""
    return spark.createDataFrame([], schema)
