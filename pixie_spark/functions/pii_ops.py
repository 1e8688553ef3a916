"""Best-effort PII redaction.

Reference: src/carnot/funcs/builtins/pii_ops.cc ('redact_pii_best_effort')
— tag-replaces emails, IPs, MACs, IMEIs, credit cards, SSNs etc. in text.
Re-expressed as a native regexp_replace chain (JVM, codegen) — no UDF.
Redacted values become '<REDACTED_KIND>' like the reference.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(x) -> Column:
    return F.col(x) if isinstance(x, str) else x


_PATTERNS: list[tuple[str, str]] = [
    # order matters: specific → general
    ("EMAIL", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("MAC_ADDR", r"\b(?:[0-9A-Fa-f]{2}:){5}[0-9A-Fa-f]{2}\b"),
    ("IPV6", r"\b(?:[0-9A-Fa-f]{1,4}:){2,7}[0-9A-Fa-f]{1,4}\b"),
    ("IP", r"\b(?:\d{1,3}\.){3}\d{1,3}\b"),
    ("CC_NUMBER", r"\b(?:\d[ -]?){13,16}\b"),
    ("SSN", r"\b\d{3}-\d{2}-\d{4}\b"),
    ("UUID", r"\b[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}\b"),
]


def redact_pii_best_effort(col) -> Column:
    c = _c(col)
    for kind, pattern in _PATTERNS:
        c = F.regexp_replace(c, pattern, f"<REDACTED_{kind}>")
    return c


def pii_counts(col) -> dict[str, Column]:
    """Per-kind PII match counts for one text column — native
    regexp_count per pattern (the redaction chain's patterns, so a
    count of 0 everywhere ⇔ redaction is a no-op on that row)."""
    c = _c(col)
    return {kind: F.regexp_count(c, F.lit(pattern)) for kind, pattern in _PATTERNS}


def pii_report(df, text_col: str = "text", group_cols: list[str] | None = None):
    """Corpus PII-exposure report: per group (or globally), the number
    of documents containing each PII kind, total matches per kind, and
    the any-PII document rate — the release-gate number a dataset card
    publishes. One codegen map stage (all regexp_count) + one
    partial+final aggregate; zero extra shuffles beyond the group key.
    """
    counts = pii_counts(F.col(text_col))
    proj = df.select(
        *(group_cols or []),
        *[v.alias(f"n_{k.lower()}") for k, v in counts.items()],
    )
    any_pii = None
    for k in counts:
        hit = (F.col(f"n_{k.lower()}") > 0).cast("long")
        any_pii = hit if any_pii is None else any_pii + hit
    proj = proj.withColumn("__any", (any_pii > 0).cast("long"))
    aggs = [F.count(F.lit(1)).alias("n_docs"), F.sum("__any").alias("docs_with_pii")]
    for k in counts:
        aggs.append(F.sum((F.col(f"n_{k.lower()}") > 0).cast("long")).alias(f"docs_{k.lower()}"))
        aggs.append(F.sum(f"n_{k.lower()}").alias(f"matches_{k.lower()}"))
    out = proj.groupBy(*(group_cols or [])).agg(*aggs) if group_cols else proj.agg(*aggs)
    return out.withColumn(
        "pii_doc_rate", F.col("docs_with_pii") / F.col("n_docs")
    )
