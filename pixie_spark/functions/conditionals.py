"""Conditional functions. Reference:
src/carnot/funcs/builtins/conditionals.cc:27-31 ('select')."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def select(cond: Column, if_true, if_false) -> Column:
    """select(cond, a, b) → when(cond, a).otherwise(b)."""
    return F.when(cond, if_true).otherwise(if_false)
