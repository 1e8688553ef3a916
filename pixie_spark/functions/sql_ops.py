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


def _params_pattern(dollar_quotes: bool) -> str:
    pats = ([_DOLLAR_LIT] if dollar_quotes else []) + [_STRING_LIT, _NUMBER_LIT]
    return "|".join(f"(?:{p})" for p in pats)


def _normalize_json(c: Column, cmd_code, dollar_quotes: bool, query_codes: tuple) -> Column:
    """Reference 2-arg form (sql_ops.cc NormalizeMySQLUDF /
    NormalizePostgresSQLUDF): returns the NormalizeResult JSON
    ``{"query": ..., "params": [...], "error": ""}``. Params are the
    literal texts in occurrence order — the same literals the
    placeholder rewrite removes. Unsupported cmd codes produce an error
    JSON, as the reference does; the prepared-statement EXECUTE parse
    path is folded into the query path (fixtures trace plain queries)."""
    code = cmd_code if isinstance(cmd_code, Column) else F.lit(cmd_code)
    params = F.regexp_extract_all(c, F.lit(_params_pattern(dollar_quotes)), 0)
    ok = F.to_json(
        F.struct(
            _normalize(c, dollar_quotes).alias("query"),
            params.alias("params"),
            F.lit("").alias("error"),
        )
    )
    err = F.to_json(
        F.struct(
            F.lit("").alias("query"),
            F.array().cast("array<string>").alias("params"),
            F.concat(F.lit("unsupported cmd_code "), code.cast("string")).alias("error"),
        )
    )
    return F.when(code.isin(*query_codes), ok).otherwise(err)


def normalize_mysql(col, cmd_code=None) -> Column:
    """1-arg: the normalized query string (engine-native extension).
    2-arg (reference signature, sql_ops.h:80): NormalizeResult JSON;
    codes 3 = COM_QUERY, 23 = COM_STMT_EXECUTE."""
    c = _c(col)
    if cmd_code is None:
        return _normalize(c, dollar_quotes=False)
    return _normalize_json(c, cmd_code, dollar_quotes=False, query_codes=(3, 23))


def normalize_pgsql(col, cmd_code=None) -> Column:
    """1-arg: the normalized query string. 2-arg (reference signature,
    sql_ops.h:51): NormalizeResult JSON; codes 'Query' / 'Execute'."""
    c = _c(col)
    if cmd_code is None:
        return _normalize(c, dollar_quotes=True)
    return _normalize_json(c, cmd_code, dollar_quotes=True, query_codes=("Query", "Execute"))
