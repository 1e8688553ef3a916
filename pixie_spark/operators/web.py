"""Web-crawl URL operators: normalization, tracking-parameter
stripping, registrable-domain extraction, blocklist filtering, and
URL-keyed dedup.

Crawl-scale corpora (C4/RefinedWeb/Dolma recipes) key their earliest,
cheapest dedup and filtering stages on the URL: normalize → drop
tracking params → eTLD+1 blocklist → URL-exact dedup, all before any
text is parsed. The reference's uri_ops/net_ops families
(src/carnot/funcs/builtins/uri_ops.cc, funcs/net/net_ops.cc) stop at
encode/decode + nslookup; this module is the training-data-pipeline
extension of that family.

Everything here is native Column expressions — parse_url (JVM built-in)
plus higher-order array functions for the query-string rewrite — so the
whole stage stays inside whole-stage codegen: a zero-shuffle scan
filter at 100 TB. The blocklist is a broadcast anti-join on the
registrable domain (dimension-sized, never shuffles the corpus).

Correctness is pinned against an independent Python urllib reference
implementation in tests/test_web.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tracking parameters stripped by normalization: the ubiquitous
# analytics/click-id keys (utm_* as a prefix class, plus exact ids).
TRACKING_PREFIXES = ("utm_",)
TRACKING_KEYS = (
    "gclid", "fbclid", "msclkid", "dclid", "mc_eid", "mc_cid",
    "igshid", "ref", "ref_src", "cmpid", "spm", "yclid",
)

# Multi-label public suffixes for the eTLD+1 heuristic. A full public
# suffix list is a data file; this covers the high-traffic two-label
# suffixes and is explicitly a documented approximation — swap in the
# full PSL as a broadcast table for production crawls.
MULTI_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "co.jp", "ne.jp", "or.jp",
    "com.au", "net.au", "org.au", "com.br", "com.cn", "com.mx",
    "co.in", "co.kr", "com.tw", "com.sg", "co.za", "com.ar", "com.tr",
)


def url_host(url: Column) -> Column:
    """Lowercased host, 'www.' stripped (parse_url is JVM-native)."""
    host = F.lower(F.try_parse_url(url, F.lit("HOST")))
    return F.when(
        host.startswith("www."), host.substr(F.lit(5), F.length(host) - 4)
    ).otherwise(host)


def _is_tracking(key: Column) -> Column:
    cond = F.lit(False)
    for p in TRACKING_PREFIXES:
        cond = cond | key.startswith(p)
    return cond | key.isin(*TRACKING_KEYS)


def clean_query(url: Column) -> Column:
    """Query string with tracking params dropped and the remainder
    sorted by key — split/filter/array_sort/array_join, all native
    higher-order functions, no Python."""
    q = F.try_parse_url(url, F.lit("QUERY"))
    parts = F.filter(
        F.split(q, "&"),
        lambda kv: (kv != "") & ~_is_tracking(F.lower(F.split(kv, "=").getItem(0))),
    )
    return F.when(q.isNull() | (F.size(parts) == 0), F.lit(None)).otherwise(
        F.array_join(F.array_sort(parts), "&")
    )


def url_normalize(url: Column) -> Column:
    """Canonical URL: lowercase scheme+host, strip www. and default
    ports, drop the fragment, strip tracking params, sort surviving
    query params, trim a trailing slash from non-root paths. NULL for
    inputs parse_url cannot read a host from."""
    scheme = F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*):", 1))
    scheme = F.when(scheme == "", F.lit("http")).otherwise(scheme)
    host = url_host(url)
    # strip the scheme's default port only; keep explicit non-default ports
    port = F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*?:(\d+)(?:[/?#]|$)", 1)
    default_port = F.when(scheme == "https", F.lit("443")).otherwise(F.lit("80"))
    port_part = F.when(
        (port == "") | (port == default_port), F.lit("")
    ).otherwise(F.concat(F.lit(":"), port))
    path = F.try_parse_url(url, F.lit("PATH"))
    path = F.when(path.isNull() | (path == ""), F.lit("/")).otherwise(path)
    path = F.when(
        (path != "/") & path.endswith("/"), path.substr(F.lit(1), F.length(path) - 1)
    ).otherwise(path)
    q = clean_query(url)
    query_part = F.when(q.isNull(), F.lit("")).otherwise(F.concat(F.lit("?"), q))
    return F.when(
        host.isNull() | (host == ""), F.lit(None)
    ).otherwise(F.concat(scheme, F.lit("://"), host, port_part, path, query_part))


def registrable_domain(host: Column) -> Column:
    """eTLD+1 heuristic: last 3 labels when the last 2 form a known
    multi-label public suffix, else last 2 labels. IP literals and
    single-label hosts pass through unchanged."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.concat_ws(".", F.element_at(labels, -2), F.element_at(labels, -1))
    last3 = F.concat_ws(
        ".", F.element_at(labels, -3), F.element_at(labels, -2), F.element_at(labels, -1)
    )
    is_ip = host.rlike(r"^\d+\.\d+\.\d+\.\d+$")
    return (
        F.when(is_ip | (n <= 2), host)
        .when(last2.isin(*MULTI_SUFFIXES), last3)
        .otherwise(last2)
    )


def url_features(df: DataFrame, url_col: str = "url") -> DataFrame:
    """url_norm / host / domain columns appended — one codegen'd map."""
    url = F.col(url_col)
    host = url_host(url)
    return df.withColumns(
        {
            "url_norm": url_normalize(url),
            "host": host,
            "domain": registrable_domain(host),
        }
    )


def blocklist_filter(
    df: DataFrame, blocklist: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Drop rows whose registrable domain is blocklisted — broadcast
    LEFT ANTI join; the corpus never shuffles. ``blocklist`` needs a
    single 'domain' column (already-registrable domains)."""
    feats = url_features(df, url_col)
    return feats.join(
        F.broadcast(blocklist.select(F.lower("domain").alias("domain")).distinct()),
        "domain",
        "left_anti",
    )


def url_dedup(df: DataFrame, url_col: str = "url", id_col: str = "doc_id") -> DataFrame:
    """URL-exact dedup on the NORMALIZED url: keep the min-id row per
    canonical URL. The shuffle key is the normalized-url hash, the same
    8-byte discipline as dedup.exact_dedup; unparseable URLs (null
    normalization) are kept — dropping them is a filtering decision,
    not a dedup decision."""
    feats = df.withColumn("url_norm", url_normalize(F.col(url_col)))
    w_key = F.coalesce(F.xxhash64("url_norm"), F.col(id_col))
    from pyspark.sql import Window

    win = Window.partitionBy(w_key).orderBy(id_col)
    return (
        feats.withColumn("_rn", F.row_number().over(win))
        .where((F.col("_rn") == 1) | F.col("url_norm").isNull())
        .drop("_rn")
    )
