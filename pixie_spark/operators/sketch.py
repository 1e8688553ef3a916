"""Count-min sketch: a fixed-size, mergeable term-frequency summary
(Cormode & Muthukrishnan 2005).

The reference's aggregate machinery is built around mergeable partial
state — UDAs carry Update/Merge/Finalize with serialized intermediates
shipped between PEM and Kelvin (src/carnot/udf/udf.h:85-133,
src/carnot/exec/agg_node.cc:186-208). The rollup family already uses
Spark's HLL sketch for mergeable distinct-counts (operators/rollup.py);
this module adds the frequency twin: approximate per-term counts in
depth×width cells regardless of vocabulary size, mergeable across
corpus slices / materialization boundaries by plain cell addition.

When to prefer it over exact counting (operators/text.vocab_stats):
vocab_stats shuffles one row per distinct term — fine for one corpus,
but a PER-SLICE term profile (per domain, per day, per source) at
100 TB multiplies that by the slice count. A CMS is depth·width cells
per slice, period, and slices combine by addition — the same reason
the rollup cascade carries HLL state instead of distinct sets.

Representation: a DataFrame of nonzero cells (j, bucket, cnt) — at most
depth·width rows, usually far fewer. Hashing: bucket_j(term) =
pmod(xxhash64(term, j), width) — per-row seeded independent hashes, the
family's standard construction (same as the Bloom filter's).

Estimates are ONE-SIDED: est ≥ true always (cells only over-count);
est ≤ true + εN with probability 1-δ for ε = e/width, δ = e^-depth.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEPTH = 4
WIDTH = 8192


def _cells(term: Column, depth: int, width: int) -> Column:
    """array<struct<j,bucket>> — the depth cells a term lands in."""
    return F.array(
        *[
            F.struct(
                F.lit(j).alias("j"),
                F.pmod(F.xxhash64(term, F.lit(j)), F.lit(width)).alias("bucket"),
            )
            for j in range(depth)
        ]
    )


def cms_build(
    df: DataFrame,
    term_col: str,
    depth: int = DEPTH,
    width: int = WIDTH,
    weight_col: str | None = None,
) -> DataFrame:
    """Build a CMS over a term column → (j, bucket, cnt) nonzero cells.

    One explode (depth rows per input row, all 8-byte structs) + one
    map-side-combined groupBy capped at depth·width output rows — the
    shuffle volume is bounded by the sketch size, not the vocabulary.
    ``weight_col`` accumulates weighted counts (e.g. pre-aggregated
    (term, count) rows feed weight_col="count")."""
    w = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    return (
        df.select(F.explode(_cells(F.col(term_col), depth, width)).alias("c"), w.alias("__w"))
        .groupBy(F.col("c.j").alias("j"), F.col("c.bucket").alias("bucket"))
        .agg(F.sum("__w").alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches built with identical (depth, width): cell-wise
    addition — CMS is linear, so merge(build(A), build(B)) EQUALS
    build(A ∪ B) exactly (tested), the property that lets per-slice /
    per-day sketches combine across materialization boundaries."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("j", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    cms: DataFrame,
    terms: DataFrame,
    term_col: str,
    depth: int = DEPTH,
    width: int = WIDTH,
) -> DataFrame:
    """Point-query a batch of terms → (term_col, est).

    est = min over the term's depth cells (missing cell → 0). The
    sketch side is ≤ depth·width rows → broadcast; the term side never
    shuffles (explode + broadcast-join + per-term min on the original
    partitioning)."""
    probes = terms.select(
        F.col(term_col), F.explode(_cells(F.col(term_col), depth, width)).alias("c")
    ).select(term_col, F.col("c.j").alias("j"), F.col("c.bucket").alias("bucket"))
    joined = probes.join(F.broadcast(cms), ["j", "bucket"], "left")
    return (
        joined.groupBy(term_col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est"))
    )


def cms_error_bound(total_count: int, width: int = WIDTH) -> float:
    """εN additive over-count bound (holds per query w.p. 1 - e^-depth):
    e/width · N."""
    import math

    return math.e / width * total_count


def hll_overlap_report(
    a: DataFrame,
    b: DataFrame,
    col: str,
    lg_k: int = 12,
    exact: bool = False,
) -> DataFrame:
    """Distinct-set overlap between two corpora WITHOUT a join: |A|,
    |B|, |A∪B| from HLL sketch states (the union is a sketch merge, so
    the B side never co-shuffles with A), then |A∩B| and Jaccard by
    inclusion-exclusion — the corpus-version QA number ("how much of
    the new crawl is the old crawl?") at sketch cost. The exact twin is
    operators/diff.snapshot_diff, which answers per-ROW questions but
    pays a full-outer join; this answers the aggregate question with
    two scans and three fixed-size states.

    Inclusion-exclusion compounds the per-sketch error (a few % of
    |A∪B| on the intersection at lg_k=12), so it is a REPORT, not a
    gate — standard practice for audience-overlap estimation. Output
    one row: (n_a, n_b, n_union, n_intersection, jaccard).
    """
    if exact:
        # oracle-parity switch (the quantiles gate-row convention):
        # exact count_distinct over the 8-byte value hash; at 100 TB the
        # sketch path is the point of this operator — exact shuffles
        # every distinct value
        ca = a.agg(F.count_distinct(col).alias("n_a"))
        cb = b.agg(F.count_distinct(col).alias("n_b"))
        cu = (
            a.select(F.col(col).alias("v"))
            .unionByName(b.select(F.col(col).alias("v")))
            .agg(F.count_distinct("v").alias("n_union"))
        )
        out = ca.crossJoin(cb).crossJoin(cu)
        inter = F.col("n_a") + F.col("n_b") - F.col("n_union")
        return out.select(
            "n_a",
            "n_b",
            "n_union",
            inter.alias("n_intersection"),
            F.when(F.col("n_union") > 0, inter / F.col("n_union")).alias("jaccard"),
        )
    sa = a.agg(F.hll_sketch_agg(col, F.lit(lg_k)).alias("s"))
    sb = b.agg(F.hll_sketch_agg(col, F.lit(lg_k)).alias("s"))
    both = sa.unionByName(sb).agg(F.hll_union_agg("s").alias("u"))
    est_a = sa.select(F.hll_sketch_estimate("s").alias("n_a"))
    est_b = sb.select(F.hll_sketch_estimate("s").alias("n_b"))
    est_u = both.select(F.hll_sketch_estimate("u").alias("n_union"))
    out = est_a.crossJoin(est_b).crossJoin(est_u)  # three 1-row frames
    inter = F.greatest(F.col("n_a") + F.col("n_b") - F.col("n_union"), F.lit(0))
    return out.select(
        "n_a",
        "n_b",
        "n_union",
        inter.alias("n_intersection"),
        F.when(F.col("n_union") > 0, inter / F.col("n_union")).alias("jaccard"),
    )
