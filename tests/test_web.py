"""URL operators (operators/web): normalization pinned against an
independent Python urllib reference, registrable-domain cases,
broadcast blocklist filtering, URL-keyed dedup, and the all-native
plan contract (no Python UDF anywhere in the stage)."""

from urllib.parse import parse_qsl, urlsplit

import pytest
from pyspark.sql import functions as F

from pixie_spark.operators import web
from pixie_spark.plans import plan_string


def _py_normalize(url: str) -> str | None:
    """Independent reference implementation via urllib — the spec the
    Spark expressions must match."""
    s = urlsplit(url if "://" in url else "http://" + url)
    host = (s.hostname or "").lower()
    if host.startswith("www."):
        host = host[4:]
    if not host:
        return None
    scheme = (s.scheme or "http").lower()
    default = {"http": 80, "https": 443}.get(scheme)
    port = f":{s.port}" if s.port and s.port != default else ""
    path = s.path or "/"
    if path != "/" and path.endswith("/"):
        path = path[:-1]
    keep = [
        f"{k}={v}" if v != "" or "=" in url.split("?", 1)[-1] else k
        for k, v in parse_qsl(s.query, keep_blank_values=True)
        if not (k.lower().startswith(web.TRACKING_PREFIXES) or k.lower() in web.TRACKING_KEYS)
    ]
    # reference uses raw kv-pair sort, mirroring array_sort on the parts
    raw = [p for p in s.query.split("&") if p]
    kept_raw = sorted(
        p for p in raw
        if not (p.split("=")[0].lower().startswith(web.TRACKING_PREFIXES)
                or p.split("=")[0].lower() in web.TRACKING_KEYS)
    )
    q = "?" + "&".join(kept_raw) if kept_raw else ""
    return f"{scheme}://{host}{port}{path}{q}"


URLS = [
    "https://www.Example.COM/a/b/?utm_source=x&id=2&utm_medium=y",
    "http://example.com:80/a/b?id=2",
    "https://example.com:443/",
    "https://example.com:8443/x?b=2&a=1",
    "http://blog.example.co.uk/post/",
    "https://sub.deep.example.org/p?fbclid=abc",
    "http://192.168.0.1/admin",
    "https://example.com/a?gclid=1&ref=t&z=9",
    "http://www.news.example.com/",
    "https://example.com/a//b/",
]


def test_normalize_matches_urllib_reference(spark):
    df = spark.createDataFrame([(i, u) for i, u in enumerate(URLS)], ["doc_id", "url"])
    got = {r.doc_id: r.n for r in df.select("doc_id", web.url_normalize(F.col("url")).alias("n")).collect()}
    for i, u in enumerate(URLS):
        assert got[i] == _py_normalize(u), u


def test_normalize_null_for_unparseable(spark):
    df = spark.createDataFrame([(1, "not a url"), (2, "%%%"), (3, None)], ["doc_id", "url"])
    out = df.select(web.url_normalize(F.col("url")).alias("n")).collect()
    assert all(r.n is None for r in out)


def test_registrable_domain_cases(spark):
    cases = {
        "example.com": "example.com",
        "a.b.example.com": "example.com",
        "blog.example.co.uk": "example.co.uk",
        "example.co.uk": "example.co.uk",
        "deep.sub.example.com.au": "example.com.au",
        "localhost": "localhost",
        "192.168.0.1": "192.168.0.1",
    }
    df = spark.createDataFrame([(h,) for h in cases], ["host"])
    got = {r.host: r.d for r in df.select("host", web.registrable_domain(F.col("host")).alias("d")).collect()}
    assert got == cases


def test_blocklist_filter_broadcast_anti(spark):
    docs = spark.createDataFrame(
        [(1, "https://spam.example.com/x"), (2, "https://good.org/y"),
         (3, "https://www.sub.spam.example.com/z"), (4, "bad input")],
        ["doc_id", "url"],
    )
    block = spark.createDataFrame([("example.com",)], ["domain"])
    out = web.blocklist_filter(docs, block)
    assert {r.doc_id for r in out.collect()} == {2, 4}  # unparseable kept
    plan = plan_string(out)
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan


def test_url_dedup_keeps_min_id_per_canonical_url(spark):
    docs = spark.createDataFrame(
        [
            (5, "https://www.example.com/a?utm_source=x"),
            (2, "http://example.com/a/"),  # different scheme → different canon
            (9, "https://example.com/a"),  # same canon as doc 5
            (7, "garbage"),  # null canon: kept
            (8, "also garbage"),  # null canon: kept
        ],
        ["doc_id", "url"],
    )
    kept = {r.doc_id for r in web.url_dedup(docs).collect()}
    assert kept == {2, 5, 7, 8}


def test_stage_is_all_native(spark):
    """The whole URL featurization is codegen-able Column expressions —
    no BatchEvalPython / ArrowEvalPython anywhere."""
    df = spark.createDataFrame([(1, "https://www.example.com/a?b=1")], ["doc_id", "url"])
    plan = plan_string(web.url_features(df))
    assert "EvalPython" not in plan, plan
