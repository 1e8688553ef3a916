"""Snapshot diff: key-level audit between two versions of a table.

Corpus curation is iterative — every recipe change or re-crawl produces
a new snapshot, and the first QA question is always "what changed?".
This operator answers it at 100 TB cost: both sides are reduced
map-side to (key, 8-byte row hash) BEFORE the join, so the single
shuffle carries ~16 bytes/row regardless of row width, and the verdict
(added / removed / changed / unchanged) is computed from hash
(in)equality on the joined frame. The wide rows themselves are fetched
only if the caller joins the verdict back — never inside the diff.

The reference has no table-diff (its tables are transient ring
buffers); this belongs to the training-data-pipeline extensions, next
to the sink's idempotent-replay story (sources/sink.py): diff a replay
against what it replaced before promoting it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _keyed_hash(df: DataFrame, keys: list[str], compare_cols: list[str]) -> DataFrame:
    # xxhash64 is null-discriminating (NULL hashes differently from any
    # value but deterministically), so no sentinel encoding is needed
    return df.select(
        *keys, F.xxhash64(*compare_cols).alias("_row_hash")
    ).dropDuplicates(keys)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
    include_unchanged: bool = False,
) -> DataFrame:
    """(keys..., status) with status ∈ added | removed | changed
    [| unchanged]. ``compare_cols`` defaults to every shared non-key
    column. Duplicate keys within a side are collapsed to one row
    (first hash wins) — a diff is keyed by definition; run exact_dedup
    first if duplicates are meaningful."""
    if compare_cols is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare_cols = [c for c in shared if c not in set(keys)]
    if not compare_cols:
        raise ValueError("no comparable columns outside the key set")
    o = _keyed_hash(old, keys, compare_cols).withColumnRenamed("_row_hash", "_h_old")
    n = _keyed_hash(new, keys, compare_cols).withColumnRenamed("_row_hash", "_h_new")
    joined = o.join(n, keys, "full_outer")
    status = (
        F.when(F.col("_h_old").isNull(), F.lit("added"))
        .when(F.col("_h_new").isNull(), F.lit("removed"))
        .when(F.col("_h_old") != F.col("_h_new"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    out = joined.select(*keys, status.alias("status"))
    if not include_unchanged:
        out = out.where(F.col("status") != "unchanged")
    return out


def diff_summary(diff: DataFrame) -> DataFrame:
    """(status, n) — the one-line QA verdict."""
    return diff.groupBy("status").agg(F.count(F.lit(1)).alias("n"))
