"""String functions. Reference: src/carnot/funcs/builtins/string_ops.cc:33-44
(contains, length, find, substring, tolower, toupper, trim, strip_prefix,
hex_to_ascii, bytes_to_hex, atoi, itoa)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(x) -> Column:
    return F.col(x) if isinstance(x, str) else (F.lit(x) if not isinstance(x, Column) else x)


def contains(s, sub) -> Column:
    return F.contains(_c(s), F.lit(sub) if isinstance(sub, str) else sub)


def length(s) -> Column:
    return F.length(_c(s))


def find(s, sub) -> Column:
    """0-based index of first occurrence, -1 if absent (C++ string::find)."""
    return F.instr(_c(s), sub) - 1


def substring(s, start, length_) -> Column:
    """0-based start (PxL) → Spark's 1-based substring."""
    return F.substring(_c(s), start + 1 if isinstance(start, int) else _c(start) + 1, length_)


def tolower(s) -> Column:
    return F.lower(_c(s))


def toupper(s) -> Column:
    return F.upper(_c(s))


def trim(s) -> Column:
    return F.trim(_c(s))


def strip_prefix(prefix, s) -> Column:
    """Remove prefix if present (string_ops.cc arg order: prefix first)."""
    c, p = _c(s), F.lit(prefix) if isinstance(prefix, str) else prefix
    return F.when(F.startswith(c, p), F.substring(c, F.length(p) + 1, F.length(c))).otherwise(c)


def hex_to_ascii(s) -> Column:
    return F.decode(F.unhex(_c(s)), "UTF-8")


def bytes_to_hex(s) -> Column:
    return F.hex(_c(s).cast("binary"))


def replace(pattern, s, replacement) -> Column:
    """px.replace (regex_ops.cc:99-112): replaces all matches of the
    REGEX pattern (first arg) in the string column (second arg) with the
    replacement (third arg) — note the reference's (pattern, col, repl)
    argument order, and that the dialect is Java regex here vs RE2
    there (both cover the corpus's literal/char-class patterns)."""
    return F.regexp_replace(
        _c(s),
        F.lit(pattern) if isinstance(pattern, str) else pattern,
        F.lit(replacement) if isinstance(replacement, str) else replacement,
    )


def atoi(s, default=None) -> Column:
    """string → int64; the reference's 2-arg form substitutes ``default``
    for unparseable input (string_ops.cc AtoiUDF). try_cast keeps
    malformed input null under ANSI mode instead of failing the job."""
    out = _c(s).try_cast("long")
    if default is not None:
        out = F.coalesce(out, F.lit(default))
    return out


def itoa(x) -> Column:
    return _c(x).cast("string")
