"""Regex functions. Reference: src/carnot/funcs/builtins/regex_ops.cc:33-35
(regex_match, regex_replace; RE2 in the reference, Java regex here —
document the dialect difference, both support the common core)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(x) -> Column:
    return F.col(x) if isinstance(x, str) else x


def regex_match(pattern: str, col) -> Column:
    """Full/partial match per RE2 'PartialMatch' semantics → rlike."""
    return _c(col).rlike(pattern)


def regex_replace(pattern: str, col, replacement: str) -> Column:
    return F.regexp_replace(_c(col), pattern, replacement)
