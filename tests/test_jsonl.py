"""JSONL corpus source (sources/jsonl.py): schema-explicit parse,
corrupt-line accounting, gzip transparency, documents-bridge contract,
and deterministic ids feeding downstream dedup."""

import gzip
import json

import pyspark.sql.functions as F
import pytest

from pixie_spark.sources.jsonl import (
    corrupt_line_count,
    jsonl_documents,
    read_jsonl,
)

DOCS = [
    {"url": "https://a.example/1", "text": "the first document body", "lang": "en"},
    {"url": "https://a.example/2", "text": "the second document body", "lang": "en"},
    {"url": "https://b.example/1", "text": "el tercero documento", "lang": "es"},
    {"url": "https://c.example/1", "text": "", "lang": "en"},          # empty text
    {"url": "https://c.example/2", "text": None, "lang": "en"},        # null text
]


@pytest.fixture(scope="module")
def jsonl_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("jsonl")
    lines = [json.dumps(r) for r in DOCS]
    lines.insert(2, "{this is not json")          # corrupt line
    lines.append('["array","not","object"]')      # wrong shape
    (d / "part-0.jsonl").write_text("\n".join(lines[:4]))
    (d / "part-1.jsonl.gz").write_bytes(gzip.compress("\n".join(lines[4:]).encode()))
    return str(d)


def test_read_with_explicit_schema(spark, jsonl_dir):
    df = read_jsonl(spark, jsonl_dir, {"url": "string", "text": "string", "lang": "string"})
    assert [f.name for f in df.schema.fields] == ["url", "text", "lang"]
    rows = {r["url"]: r for r in df.collect() if r["url"]}
    assert rows["https://a.example/1"]["lang"] == "en"
    # fields absent from the declared schema are never surfaced
    assert "extra" not in df.columns


def test_corrupt_lines_counted_not_dropped_silently(spark, jsonl_dir):
    n = corrupt_line_count(spark, jsonl_dir, {"url": "string", "text": "string"})
    assert n == 2  # the broken brace + the array line


def test_documents_bridge_shape_and_filtering(spark, jsonl_dir):
    docs = jsonl_documents(spark, jsonl_dir, extra_fields={"lang": "string"})
    rows = docs.collect()
    # empty-text and null-text rows dropped; 3 usable docs survive
    assert len(rows) == 3
    assert [f.name for f in docs.schema.fields] == ["doc_id", "url", "text", "lang"]
    assert all(r["doc_id"] is not None for r in rows)
    assert len({r["doc_id"] for r in rows}) == 3


def test_doc_ids_deterministic_and_url_keyed(spark, jsonl_dir):
    a = {r["url"]: r["doc_id"] for r in jsonl_documents(spark, jsonl_dir).collect()}
    b = {r["url"]: r["doc_id"] for r in jsonl_documents(spark, jsonl_dir).collect()}
    assert a == b
    # id is the url hash: recomputable from the url alone
    expect = {
        r["url"]: r["h"]
        for r in spark.createDataFrame([(u,) for u in a], "url string")
        .select("url", F.xxhash64("url").alias("h"))
        .collect()
    }
    assert a == expect


def test_bridge_feeds_downstream_dedup(spark, jsonl_dir):
    from pixie_spark.operators.dedup import exact_dedup

    docs = jsonl_documents(spark, jsonl_dir)
    groups = exact_dedup(docs, "doc_id", ["text"])
    assert groups.count() == 3  # all distinct texts


def test_null_url_rows_get_distinct_text_keyed_ids(spark, tmp_path):
    # Rows with a DECLARED url field but a null/empty url value must not
    # all hash the same null to one constant doc_id (they would be
    # silently merged by every doc_id-keyed downstream operator) — each
    # falls back to xxhash64 of its own text.
    d = tmp_path / "nourl"
    d.mkdir()
    rows = [
        {"url": None, "text": "alpha body one"},
        {"text": "beta body two"},                  # key absent entirely
        {"url": "", "text": "gamma body three"},    # empty string url
        {"url": "https://x.example/1", "text": "delta body four"},
    ]
    (d / "p.jsonl").write_text("\n".join(json.dumps(r) for r in rows))
    docs = jsonl_documents(spark, str(d)).collect()
    ids = {r["text"]: r["doc_id"] for r in docs}
    assert len(set(ids.values())) == 4  # all distinct
    # url-less ids are recomputable from the text; url-bearing from url
    hashed = {
        r["s"]: r["h"]
        for r in spark.createDataFrame(
            [("alpha body one",), ("https://x.example/1",)], "s string"
        ).select("s", F.xxhash64("s").alias("h")).collect()
    }
    assert ids["alpha body one"] == hashed["alpha body one"]
    assert ids["delta body four"] == hashed["https://x.example/1"]


# ---------------------------------------------------------------------------
# write_jsonl: the export half of the interchange contract
# ---------------------------------------------------------------------------


def test_write_jsonl_roundtrips_through_read_jsonl(spark, tmp_path):
    from pixie_spark.sources.jsonl import read_jsonl, write_jsonl

    rows = [
        (1, "http://a.example/x", "alpha text", "en"),
        (2, None, "beta text with \"quotes\" and \\ slashes", None),
        (3, "http://c.example/z", "unicode ✓ 中文", "zh"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, text string, lang string")
    out = str(tmp_path / "export")
    write_jsonl(df, out, docs_per_file=2)
    back = read_jsonl(
        spark, out, {"doc_id": "long", "url": "string", "text": "string", "lang": "string"}
    )
    got = sorted(
        (r["doc_id"], r["url"], r["text"], r["lang"]) for r in back.collect()
    )
    assert got == sorted(rows)
    # gzip archives, row-count-sized: 3 rows at 2/file -> 2 data files
    import glob

    files = sorted(glob.glob(out + "/part-*.gz"))
    assert len(files) == 2
    # null fields are emitted explicitly (ignoreNullFields=false) so
    # external consumers see every declared key on every row
    import gzip

    lines = [ln for f in files for ln in gzip.open(f, "rt").read().splitlines()]
    doc2 = next(ln for ln in lines if '"doc_id":2' in ln)
    assert '"url":null' in doc2 and '"lang":null' in doc2


def test_write_jsonl_rerun_is_byte_stable(spark, tmp_path):
    import glob

    from pixie_spark.sources.jsonl import write_jsonl

    df = spark.createDataFrame(
        [(i, f"text number {i}") for i in range(20)], "doc_id long, text string"
    ).repartition(7)  # scrambled incoming layout
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    write_jsonl(df, a, docs_per_file=6)
    write_jsonl(df.repartition(3), b, docs_per_file=6)  # different layout in
    read = lambda d: [  # noqa: E731
        open(f, "rb").read() for f in sorted(glob.glob(d + "/part-*.gz"))
    ]
    assert read(a) == read(b)
