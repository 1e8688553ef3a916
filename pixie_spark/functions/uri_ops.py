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
