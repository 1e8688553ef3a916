"""Semantic-type display formatting (the UI-side role of pixie's
SemanticType lattice, engine-side as native expressions)."""

from pyspark.sql import functions as F

from pixie_spark.api.formatting import (
    format_bytes,
    format_duration_ns,
    format_percent,
    format_result,
)
from pixie_spark.sources.fixtures import http_events_fixture


def test_scalar_formatters(spark):
    df = spark.createDataFrame(
        [(1536, 2_300_000, 0.1234), (3, 450, 0.999)], ["b", "d", "p"]
    )
    rows = df.select(
        format_bytes(F.col("b")).alias("b"),
        format_duration_ns(F.col("d")).alias("d"),
        format_percent(F.col("p")).alias("p"),
    ).collect()
    assert (rows[0]["b"], rows[0]["d"], rows[0]["p"]) == ("1.5 KiB", "2.3 ms", "12.3%")
    assert (rows[1]["b"], rows[1]["d"], rows[1]["p"]) == ("3 B", "450 ns", "99.9%")


def test_format_result_uses_schema_metadata(spark):
    events = http_events_fixture(spark, n=20)
    out = format_result(events.select("latency", "resp_body_size", "req_path"))
    # latency: ST_DURATION_NS; resp_body_size: ST_BYTES; req_path: none
    assert "latency_fmt" in out.columns and "resp_body_size_fmt" in out.columns
    assert "req_path_fmt" not in out.columns
    r = out.select("latency", "latency_fmt").first()
    assert r["latency_fmt"][-2:] in (" s", "ms", "µs", "ns")
