"""Join strategies for scale: bucketed co-located joins and salted skew
joins — code backing the SCALE.md shuffle-discipline claims.

- write_bucketed / bucketed co-located join: both fact tables bucketed by
  the join key at WRITE time → the join plan has no Exchange at READ time
  (asserted in tests/test_layout.py). This is the Spark equivalent of the
  reference's tablet/data-locality story for repeated fact-fact joins.
- salted_join: explicit skew mitigation when one key dominates — the
  skewed side's rows get a random salt in [0,S), the other side is
  replicated S× with all salts, and the join key becomes (key, salt).
  AQE's skew-join splitting handles most cases automatically (enabled
  session-wide); salting is for persistent hot keys known ahead of time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame, table_name: str, bucket_col: str, n_buckets: int = 32, sort_col: str | None = None
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table_name)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equijoin on ``key`` with the LEFT side salted (assumed skewed) and
    the RIGHT side replicated across salts.

    Shuffle keys become (key, salt) → a hot key's rows spread over
    n_salts reducers instead of one straggler. Replication cost:
    |right| × n_salts — use when right is much smaller than the skewed
    left (but too big / unsuitable to broadcast).

    Only inner/left joins are supported: right/full/anti would emit one
    row per UNMATCHED REPLICA of the right side (n_salts spurious rows
    per unmatched key) — a correctness trap, so they raise.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports inner/left joins only, got {how!r} "
            "(right/full would duplicate unmatched right replicas)"
        )
    salt_col = "__pixie_salt"
    while salt_col in left.columns or salt_col in right.columns:
        salt_col += "_"
    salted_left = left.withColumn(
        salt_col, (F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))).cast("int")
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias(salt_col)
    replicated_right = right.select("*", salts)
    out = salted_left.join(replicated_right, [key, salt_col], how)
    return out.drop(salt_col)
