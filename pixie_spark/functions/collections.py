"""Collection UDAs. Reference: src/carnot/funcs/builtins/collections.cc:26-31
('any' — pick an arbitrary value per group)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(x) -> Column:
    return F.col(x) if isinstance(x, str) else x


def any(x) -> Column:  # noqa: A001
    """Arbitrary element per group (the reference takes the first seen)."""
    return F.first(_c(x), ignorenulls=False)
