"""WARC/WET crawl-archive ingestion source.

Web-scale training corpora arrive as WARC archives (ISO 28500 — the
Common Crawl interchange format) or their WET text conversions. The
reference ingests only its own table store; this source is the
training-data-pipeline front end that turns raw crawl archives into the
``documents``-shaped tables every downstream operator here consumes
(url filtering → quality → dedup → …).

Spark-first shape: ``spark.read.format("binaryFile")`` distributes one
task per archive file (the natural unit — WARC members are not
splittable mid-file), and an Arrow-batched ``mapInPandas`` kernel
parses records out of the file bytes. Record payloads leave the kernel
only as the requested projection (text or payload), so a text-only WET
read never carries response bytes into a shuffle. Gzipped archives
(.warc.gz multi-member per-record gzip, the Common Crawl layout)
decompress transparently.

The parser is a from-scratch implementation of the record grammar
(version line, CRLF header block, Content-Length body, CRLF CRLF
separator) in pure Python — no warcio dependency. ``build_warc_bytes``
is the matching writer, used by tests for roundtrips and available as
an interchange sink.
"""

from __future__ import annotations

import gzip
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

WARC_SCHEMA = T.StructType(
    [
        T.StructField("warc_file", T.StringType(), False),
        T.StructField("record_id", T.StringType(), True),
        T.StructField("warc_type", T.StringType(), True),
        T.StructField("target_uri", T.StringType(), True),
        T.StructField("warc_date", T.StringType(), True),
        T.StructField("content_type", T.StringType(), True),
        T.StructField("content_length", T.LongType(), True),
        T.StructField("payload", T.BinaryType(), True),
    ]
)


def parse_warc_records(buf: bytes) -> Iterator[dict]:
    """Yield {header-name-lowercase: value, 'payload': bytes} per WARC
    record. Tolerant of trailing garbage: parsing stops at the first
    position that is not a WARC version line."""
    pos = 0
    n = len(buf)
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and buf[pos : pos + 2] == b"\r\n":
            pos += 2
        if not buf[pos : pos + 5] == b"WARC/":
            return
        head_end = buf.find(b"\r\n\r\n", pos)
        if head_end < 0:
            return
        headers: dict[str, str] = {}
        lines = buf[pos:head_end].split(b"\r\n")
        for line in lines[1:]:  # lines[0] is the version line
            k, _, v = line.partition(b":")
            headers[k.strip().lower().decode("ascii", "replace")] = (
                v.strip().decode("utf-8", "replace")
            )
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            return
        body_start = head_end + 4
        payload = buf[body_start : body_start + length]
        if len(payload) < length:
            return  # truncated archive: stop at the last complete record
        headers["payload"] = payload
        yield headers
        pos = body_start + length


def _maybe_gunzip(path: str, content: bytes) -> bytes:
    if path.endswith(".gz"):
        # multi-member gzip (one member per record, the Common Crawl
        # layout) — Python's gzip reads concatenated members as one
        return gzip.decompress(content)
    return content


def read_warc(
    spark: SparkSession,
    path: str,
    record_types: tuple[str, ...] = ("response", "conversion"),
) -> DataFrame:
    """WARC records as rows. One task per archive file; filtering on
    record type happens inside the parse kernel so skipped records
    never materialize as rows."""
    wanted = {t.lower() for t in record_types}

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path_, content in zip(pdf["path"], pdf["content"]):
                for rec in parse_warc_records(_maybe_gunzip(path_, bytes(content))):
                    if rec.get("warc-type", "").lower() not in wanted:
                        continue
                    rows.append(
                        (
                            path_,
                            rec.get("warc-record-id"),
                            rec.get("warc-type"),
                            rec.get("warc-target-uri"),
                            rec.get("warc-date"),
                            rec.get("content-type"),
                            len(rec["payload"]),
                            rec["payload"],
                        )
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in WARC_SCHEMA.fields])

    return (
        spark.read.format("binaryFile")
        .load(path)
        .select("path", "content")
        .mapInPandas(kernel, schema=WARC_SCHEMA)
    )


def http_body(payload: Column) -> Column:
    """Response-record payloads are HTTP messages; the body starts after
    the first CRLF CRLF. Native byte ops (no Python): locate the
    separator in the decoded string and substring past it."""
    s = payload.cast("string")
    sep = F.instr(s, "\r\n\r\n")
    return F.when(sep == 0, s).otherwise(F.substring(s, sep + 4, F.length(s)))


def html_to_text(html: Column) -> Column:
    """Minimal tag stripper for the ingestion demo: drop script/style
    blocks, strip tags, collapse whitespace, decode the few most common
    entities. A documented approximation (real pipelines plug a proper
    extractor into the same column position); native regexp chain."""
    t = F.regexp_replace(html, r"(?is)<(script|style)[^>]*>.*?</\1>", " ")
    t = F.regexp_replace(t, r"(?s)<[^>]+>", " ")
    for ent, ch in (("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"),
                    ("&quot;", "\""), ("&#39;", "'"), ("&nbsp;", " ")):
        t = F.replace(t, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(t, r"\s+", " "))


def warc_documents(warc: DataFrame) -> DataFrame:
    """WARC rows → the documents-table shape downstream operators eat:
    (doc_id, url, text). WET 'conversion' records are already text;
    'response' records get http-header strip + tag strip. doc_id is the
    xxhash64 of (file, record id) — stable across re-reads."""
    text = F.when(
        F.col("warc_type") == "conversion", F.col("payload").cast("string")
    ).otherwise(html_to_text(http_body(F.col("payload"))))
    return warc.select(
        F.xxhash64("warc_file", "record_id").alias("doc_id"),
        F.col("target_uri").alias("url"),
        text.alias("text"),
    )


def build_warc_bytes(records: list[dict]) -> bytes:
    """Writer twin of parse_warc_records: each dict needs warc_type +
    payload (bytes) and may carry target_uri/record_id/date/
    content_type. Produces a spec-shaped uncompressed WARC buffer."""
    out = bytearray()
    for i, rec in enumerate(records):
        payload = rec["payload"]
        headers = [
            ("WARC-Type", rec["warc_type"]),
            ("WARC-Record-ID", rec.get("record_id", f"<urn:uuid:rec-{i}>")),
            ("WARC-Date", rec.get("date", "2026-01-01T00:00:00Z")),
            ("Content-Length", str(len(payload))),
        ]
        if "target_uri" in rec:
            headers.insert(3, ("WARC-Target-URI", rec["target_uri"]))
        if "content_type" in rec:
            headers.append(("Content-Type", rec["content_type"]))
        out += b"WARC/1.0\r\n"
        for k, v in headers:
            out += f"{k}: {v}\r\n".encode()
        out += b"\r\n" + payload + b"\r\n\r\n"
    return bytes(out)
