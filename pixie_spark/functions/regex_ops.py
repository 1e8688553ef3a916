"""Regex functions. Reference: src/carnot/funcs/builtins/regex_ops.cc:33-35
(regex_match, regex_replace; RE2 in the reference, Java regex here —
document the dialect difference, both support the common core)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(x) -> Column:
    return F.col(x) if isinstance(x, str) else x


def regex_match(pattern: str, col) -> Column:
    """Full-string match: the reference's RegexMatchUDF uses
    RE2::FullMatch — "the regex pattern must match the full string"
    (regex_ops.h:40-64) — so anchor the pattern around a non-capturing
    group. rlike alone would be PartialMatch (substring) semantics.
    Dialect note: reference is RE2, Spark is Java regex; the common core
    (no lookbehind on the RE2 side) behaves identically.
    """
    return _c(col).rlike(f"^(?:{pattern})$")


def regex_search(pattern: str, col) -> Column:
    """Substring (RE2 PartialMatch) semantics → plain rlike."""
    return _c(col).rlike(pattern)


def regex_replace(pattern: str, col, replacement: str) -> Column:
    return F.regexp_replace(_c(col), pattern, replacement)
