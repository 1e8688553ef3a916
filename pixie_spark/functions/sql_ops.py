"""SQL query normalization (fingerprinting).

Reference: src/carnot/funcs/builtins/sql_ops.cc (+ sql_parsing/) —
normalize_mysql / normalize_pgsql replace literals with placeholders so
queries group by shape. The reference uses a real tokenizer; this
re-expression uses a regexp_replace chain — native JVM expressions, no
UDF — covering the literal classes that matter for fingerprinting:
single-quoted strings (with '' and \\' escapes), dollar-quoted strings
(pgsql), numeric literals, and IN-list collapsing.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(x) -> Column:
    return F.col(x) if isinstance(x, str) else x


_STRING_LIT = r"'(?:[^'\\]|\\.|'')*'"
_DOLLAR_LIT = r"\$([A-Za-z_]*)\$.*?\$\1\$"
_NUMBER_LIT = r"(?<![A-Za-z_0-9])[+-]?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?"


def _normalize(col: Column, dollar_quotes: bool) -> Column:
    c = col
    if dollar_quotes:
        c = F.regexp_replace(c, _DOLLAR_LIT, "?")
    c = F.regexp_replace(c, _STRING_LIT, "?")
    c = F.regexp_replace(c, _NUMBER_LIT, "?")
    # collapse IN (?, ?, ?) → IN (?)
    c = F.regexp_replace(c, r"(?i)(IN\s*\()\s*\?(?:\s*,\s*\?)*\s*\)", r"$1?)")
    # normalize whitespace
    c = F.trim(F.regexp_replace(c, r"\s+", " "))
    return c


def normalize_mysql(col) -> Column:
    return _normalize(_c(col), dollar_quotes=False)


def normalize_pgsql(col) -> Column:
    return _normalize(_c(col), dollar_quotes=True)
