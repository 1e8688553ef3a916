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
    """The reference's 'uri_parse': decompose a URI into parts. Returns a
    struct(scheme, host, port, path, query) built on Spark's parse_url."""
    c = _c(col)
    # parse_url has no PORT part — pull it off AUTHORITY (host[:port])
    port = F.regexp_extract(F.parse_url(c, F.lit("AUTHORITY")), r":(\d+)$", 1)
    return F.struct(
        F.regexp_extract(c, r"^([a-zA-Z][a-zA-Z0-9+.-]*):", 1).alias("scheme"),
        F.parse_url(c, F.lit("HOST")).alias("host"),
        F.when(port != "", port.cast("long")).alias("port"),
        F.parse_url(c, F.lit("PATH")).alias("path"),
        F.parse_url(c, F.lit("QUERY")).alias("query"),
    )


def uri_recompose(scheme, host, port, path, query) -> Column:
    """The reference's 'uri_recompose': rebuild a URI string from parts."""
    def c(x):
        return x if isinstance(x, Column) else F.lit(x)

    port_part = F.when(
        c(port).isNotNull() & (c(port).cast("long") > 0),
        F.concat(F.lit(":"), c(port).cast("string")),
    ).otherwise(F.lit(""))
    query_part = F.when(
        c(query).isNotNull() & (c(query) != ""), F.concat(F.lit("?"), c(query))
    ).otherwise(F.lit(""))
    return F.concat(c(scheme), F.lit("://"), c(host), port_part, c(path), query_part)
