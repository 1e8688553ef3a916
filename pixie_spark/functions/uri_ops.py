"""URI functions. Reference: src/carnot/funcs/builtins/uri_ops.cc
(uri_encode, uri_decode)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(x) -> Column:
    return F.col(x) if isinstance(x, str) else x


def uri_encode(col) -> Column:
    return F.url_encode(_c(col))


def uri_decode(col) -> Column:
    return F.url_decode(_c(col))


def uri_parse(col) -> Column:
    """The reference's 'uri_parse' (src/carnot/funcs/builtins/uri_ops.h —
    scheme/userInfo/host/port/path/query/fragment): decompose a URI into
    a 7-field struct built on Spark's parse_url. Schemeless input yields
    null scheme (parse_url PROTOCOL semantics), not a misparsed host."""
    c = _c(col)
    # parse_url has no PORT part — pull it off AUTHORITY (host[:port])
    port = F.regexp_extract(F.parse_url(c, F.lit("AUTHORITY")), r":(\d+)$", 1)
    return F.struct(
        F.parse_url(c, F.lit("PROTOCOL")).alias("scheme"),
        F.parse_url(c, F.lit("USERINFO")).alias("user_info"),
        F.parse_url(c, F.lit("HOST")).alias("host"),
        F.when(port != "", port.cast("long")).alias("port"),
        F.parse_url(c, F.lit("PATH")).alias("path"),
        F.parse_url(c, F.lit("QUERY")).alias("query"),
        F.parse_url(c, F.lit("REF")).alias("fragment"),
    )


def uri_recompose(scheme, user_info, host, port, path, query, fragment) -> Column:
    """The reference's 'uri_recompose': rebuild a URI string from parts.

    Positional order matches the reference exactly —
    (scheme, userInfo, host, port, path, query, fragment), uri_ops.h:104,
    167-173 — so a verbatim-ported PxL call binds each argument to the
    right part."""
    def c(x):
        return x if isinstance(x, Column) else F.lit(x)

    user_part = (
        F.when(c(user_info).isNotNull() & (c(user_info) != ""), F.concat(c(user_info), F.lit("@")))
        .otherwise(F.lit(""))
        if user_info is not None
        else F.lit("")
    )
    port_part = F.when(
        c(port).isNotNull() & (c(port).cast("long") > 0),
        F.concat(F.lit(":"), c(port).cast("string")),
    ).otherwise(F.lit(""))
    query_part = F.when(
        c(query).isNotNull() & (c(query) != ""), F.concat(F.lit("?"), c(query))
    ).otherwise(F.lit(""))
    frag_part = (
        F.when(c(fragment).isNotNull() & (c(fragment) != ""), F.concat(F.lit("#"), c(fragment)))
        .otherwise(F.lit(""))
        if fragment is not None
        else F.lit("")
    )
    return F.concat(
        c(scheme), F.lit("://"), user_part, c(host), port_part, c(path), query_part, frag_part
    )
