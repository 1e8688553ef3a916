"""Table registration — the Spark replacement for the reference's
TableStore (src/table_store/table/table_store.h:79): a name → table map
backed by the session catalog instead of per-node in-memory stores.

At 100 TB these would be external catalog tables partitioned by a time
bucket; here we register parquet paths as temp views so both the
DataFrame API and spark.sql() resolve the same names.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """MemorySource equivalent: a declarative scan. Column projection and
    time-range predicates applied downstream reach the parquet reader via
    Catalyst pushdown (ref operator: src/carnot/exec/memory_source_node.cc).

    TIMESTAMP(NANOS) parquet columns (events.ts) are read as long ns —
    matching the reference's TIME64NS = int64 ns convention (SURVEY §1.2).
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def register_testdata(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every testdata table as a temp view; returns the frames."""
    out = {}
    for name in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            df = spark.read.parquet(path)
            df.createOrReplaceTempView(name)
            out[name] = df
    return out


def empty_source(spark: SparkSession, schema) -> DataFrame:
    """EmptySource operator (src/carnot/exec/empty_source_node.cc): a
    zero-row frame with a fixed schema."""
    return spark.createDataFrame([], schema)
