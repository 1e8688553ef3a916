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
