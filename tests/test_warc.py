"""WARC/WET ingestion source (sources/warc): parser vs the writer twin
roundtrip, gzip multi-member archives, record-type projection, HTTP
body/tag stripping, the documents-table bridge, and truncation
tolerance."""

import gzip

import pytest
from pyspark.sql import functions as F

from pixie_spark.sources.warc import (
    build_warc_bytes,
    parse_warc_records,
    read_warc,
    warc_documents,
)

HTML = (
    b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
    b"<html><head><style>p{color:red}</style></head>"
    b"<body><h1>Title &amp; more</h1><p>Hello <b>world</b></p>"
    b"<script>var x=1;</script></body></html>"
)

RECORDS = [
    {"warc_type": "warcinfo", "payload": b"software: test\r\n"},
    {
        "warc_type": "response",
        "target_uri": "https://example.com/a",
        "record_id": "<urn:uuid:r1>",
        "content_type": "application/http;msgtype=response",
        "payload": HTML,
    },
    {
        "warc_type": "conversion",
        "target_uri": "https://example.com/b",
        "record_id": "<urn:uuid:r2>",
        "content_type": "text/plain",
        "payload": "Plain extracted text é".encode(),
    },
]


def test_parser_roundtrips_writer():
    buf = build_warc_bytes(RECORDS)
    got = list(parse_warc_records(buf))
    assert [r["warc-type"] for r in got] == ["warcinfo", "response", "conversion"]
    assert got[1]["warc-target-uri"] == "https://example.com/a"
    assert got[1]["payload"] == HTML
    assert int(got[2]["content-length"]) == len(RECORDS[2]["payload"])


def test_parser_stops_at_truncation():
    buf = build_warc_bytes(RECORDS)
    cut = buf[: buf.rfind(b"conversion") + 40]  # last record incomplete
    got = list(parse_warc_records(cut))
    assert [r["warc-type"] for r in got] == ["warcinfo", "response"]


@pytest.fixture()
def warc_dir(tmp_path):
    (tmp_path / "a.warc").write_bytes(build_warc_bytes(RECORDS))
    # per-record gzip members, the Common Crawl layout
    gz = b"".join(gzip.compress(build_warc_bytes([r])) for r in RECORDS)
    (tmp_path / "b.warc.gz").write_bytes(gz)
    return str(tmp_path)


def test_read_warc_both_files_filtered(spark, warc_dir):
    df = read_warc(spark, warc_dir)
    rows = df.collect()
    # warcinfo filtered out by default; 2 kept per file × 2 files
    assert len(rows) == 4
    assert {r.warc_type for r in rows} == {"response", "conversion"}
    assert all(r.content_length == len(r.payload) for r in rows)
    only_resp = read_warc(spark, warc_dir, record_types=("response",))
    assert only_resp.count() == 2


def test_warc_documents_bridge(spark, warc_dir):
    docs = warc_documents(read_warc(spark, warc_dir)).collect()
    by_url = {}
    for r in docs:
        by_url.setdefault(r.url, set()).add(r.text)
    assert by_url["https://example.com/b"] == {"Plain extracted text é"}
    (html_text,) = by_url["https://example.com/a"]
    assert html_text == "Title & more Hello world"  # headers/tags/script gone
    # doc_id stable across re-reads
    again = {r.doc_id for r in warc_documents(read_warc(spark, warc_dir)).collect()}
    assert again == {r.doc_id for r in docs}


def test_documents_feed_downstream_ops(spark, warc_dir):
    """The bridge output plugs straight into the URL + quality family."""
    from pixie_spark.operators import web
    from pixie_spark.operators.text import quality_score

    docs = warc_documents(read_warc(spark, warc_dir))
    out = web.url_features(docs).withColumn("q", quality_score(F.col("text")))
    rows = out.collect()
    assert all(r.domain == "example.com" for r in rows)
    assert all(r.q is not None for r in rows)
