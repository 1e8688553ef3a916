"""Custom stateful streaming operator (applyInPandasWithState): final
per-key state over a stream must equal the batch aggregate of the same
data — state survives across micro-batches."""

import time

import pytest
from pyspark.sql import functions as F

from pixie_spark.streaming.stateful import running_totals


@pytest.fixture(scope="module")
def events_parts(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("stateful_events"))
    df = spark.range(0, 1000).select(
        (F.col("id") % 7).alias("user_id"),
        (F.col("id") * 1.5).alias("value"),
        (F.col("id") * 1_000_000).alias("time_"),
    )
    # several files → several micro-batches with maxFilesPerTrigger=1
    df.repartition(4).write.mode("overwrite").parquet(d)
    return d, df.schema


def test_stateful_running_totals_match_batch(spark, events_parts, tmp_path):
    d, schema = events_parts
    batch = running_totals(spark.read.schema(schema).parquet(d), "user_id", "value", "time_")
    expected = {
        r["user_id"]: (r["n_events"], r["total"], r["last_seen"]) for r in batch.collect()
    }

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(d)
    )
    out = running_totals(stream, "user_id", "value", "time_")
    q = (
        out.writeStream.format("memory")
        .queryName("stateful_totals")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        t0 = time.time()
        while time.time() - t0 < 90:
            p = q.lastProgress
            if p is not None and p.get("numInputRows", -1) == 0:
                break
            time.sleep(1)
        # memory sink in update mode appends every update — take the LAST
        # emitted row per key (the final state)
        rows = spark.sql(
            """
            SELECT user_id, n_events, total, last_seen FROM (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY n_events DESC) rn
                FROM stateful_totals
            ) WHERE rn = 1
            """
        ).collect()
        got = {r["user_id"]: (r["n_events"], r["total"], r["last_seen"]) for r in rows}
        assert got == expected
    finally:
        q.stop()
