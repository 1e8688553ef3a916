"""Request-path templating / clustering.

Reference: src/carnot/funcs/builtins/request_path_ops.cc — clusters URL
paths into templates (/api/v1/items/123 → /api/v1/items/*) via a
UDA+UDF pair. Re-expressed in two tiers:

1. ``template_path`` — native regex templating of volatile segments
   (numbers, uuids, long hex) — covers the overwhelming share of real
   traffic, zero-shuffle.
2. ``cluster_paths`` — frequency-based refinement: after templating,
   segments at the same depth with cardinality above a threshold
   collapse to '*' (the data-driven part of the reference's clustering),
   computed with explode + groupBy aggregations.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _c(x) -> Column:
    return F.col(x) if isinstance(x, str) else x


_NUM_SEG = r"(?<=/)\d+(?=/|$)"
_UUID_SEG = r"(?<=/)[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}(?=/|$)"
_HEX_SEG = r"(?<=/)[0-9a-fA-F]{16,}(?=/|$)"


def template_path(col) -> Column:
    """Replace volatile path segments with '*'."""
    c = F.regexp_replace(_c(col), r"\?.*$", "")  # strip query string
    c = F.regexp_replace(c, _UUID_SEG, "*")
    c = F.regexp_replace(c, _HEX_SEG, "*")
    c = F.regexp_replace(c, _NUM_SEG, "*")
    return c


def cluster_paths(
    df: DataFrame, path_col: str = "req_path", max_segment_cardinality: int = 20
) -> DataFrame:
    """Collapse high-cardinality path segments to '*' per (depth, prefix).

    Returns (path_template ↔ original path) mapping. Plan: template →
    split to segments → per (depth, prefix) distinct-count → segments
    whose slot exceeds the cardinality threshold become '*'. Two hash
    aggregations, one broadcast join back — scales linearly.
    """
    base = df.select(_c(path_col).alias("path")).distinct()
    seg = base.select(
        "path",
        template_path(F.col("path")).alias("tpath"),
    ).select("path", "tpath", F.posexplode(F.split(F.expr("substring(tpath, 2)"), "/")).alias("depth", "segment"))
    seg = seg.withColumn(
        "prefix",
        F.when(F.col("depth") == 0, F.lit("")).otherwise(
            F.concat_ws("/", F.slice(F.split(F.expr("substring(tpath, 2)"), "/"), 1, F.col("depth")))
        ),
    )
    card = seg.groupBy("depth", "prefix").agg(
        F.countDistinct("segment").alias("n_distinct")
    )
    joined = seg.join(F.broadcast(card), ["depth", "prefix"])
    collapsed = joined.withColumn(
        "out_segment",
        F.when(F.col("n_distinct") > max_segment_cardinality, F.lit("*")).otherwise(
            F.col("segment")
        ),
    )
    rebuilt = (
        collapsed.groupBy("path")
        .agg(F.sort_array(F.collect_list(F.struct("depth", "out_segment"))).alias("segs"))
        .select(
            "path",
            F.concat(
                F.lit("/"),
                F.concat_ws("/", F.transform("segs", lambda s: s["out_segment"])),
            ).alias("path_template"),
        )
    )
    return rebuilt
