"""Semantic-type-driven result formatting.

The reference's UI formats columns by their SemanticType (ST_BYTES →
'1.5 MiB', ST_DURATION_NS → '2.3 ms', ST_PERCENT → '12.3%'; see
SURVEY §1.2 — the second type lattice exists precisely to drive display).
This module is the engine-side equivalent: given a DataFrame whose
schema carries ``semantic_type`` field metadata (pixie_spark.types.field),
produce display-formatted string columns.

Formatting is native Spark expressions — usable inside queries, not just
driver-side — so a formatted export (e.g. to a report table) scales like
any other map stage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def format_bytes(col: Column) -> Column:
    """1536 → '1.5 KiB' (binary units, one decimal)."""
    c = col.cast("double")
    return (
        F.when(c >= 1024.0**4, F.concat(F.format_number(c / 1024.0**4, 1), F.lit(" TiB")))
        .when(c >= 1024.0**3, F.concat(F.format_number(c / 1024.0**3, 1), F.lit(" GiB")))
        .when(c >= 1024.0**2, F.concat(F.format_number(c / 1024.0**2, 1), F.lit(" MiB")))
        .when(c >= 1024.0, F.concat(F.format_number(c / 1024.0, 1), F.lit(" KiB")))
        .otherwise(F.concat(c.cast("long").cast("string"), F.lit(" B")))
    )


def format_duration_ns(col: Column) -> Column:
    """2_300_000 → '2.3 ms' (largest sub-unit with one decimal)."""
    c = col.cast("double")
    return (
        F.when(c >= 86_400e9, F.concat(F.format_number(c / 86_400e9, 1), F.lit(" d")))
        .when(c >= 3_600e9, F.concat(F.format_number(c / 3_600e9, 1), F.lit(" h")))
        .when(c >= 60e9, F.concat(F.format_number(c / 60e9, 1), F.lit(" min")))
        .when(c >= 1e9, F.concat(F.format_number(c / 1e9, 1), F.lit(" s")))
        .when(c >= 1e6, F.concat(F.format_number(c / 1e6, 1), F.lit(" ms")))
        .when(c >= 1e3, F.concat(F.format_number(c / 1e3, 1), F.lit(" µs")))
        .otherwise(F.concat(c.cast("long").cast("string"), F.lit(" ns")))
    )


def format_percent(col: Column) -> Column:
    """0.1234 → '12.3%' (the reference stores ST_PERCENT as a ratio)."""
    return F.concat(F.format_number(col.cast("double") * 100.0, 1), F.lit("%"))


_FORMATTERS = {
    "ST_BYTES": format_bytes,
    "ST_DURATION_NS": format_duration_ns,
    "ST_THROUGHPUT_BYTES_PER_NS": format_bytes,  # per-ns scaled upstream
    "ST_PERCENT": format_percent,
}


def format_result(df: DataFrame, suffix: str = "_fmt") -> DataFrame:
    """Add a formatted string column per semantically-typed column.

    Columns whose StructField.metadata carries a known ``semantic_type``
    get a ``<name><suffix>`` companion; everything else is untouched.
    """
    out = df
    for f in df.schema.fields:
        st = (f.metadata or {}).get("semantic_type")
        fmt = _FORMATTERS.get(st)
        if fmt is not None:
            out = out.withColumn(f.name + suffix, fmt(F.col(f.name)))
    return out
