"""Graph operators over edge DataFrames: PageRank (domain authority).

Web-corpus curation uses host-level link authority as a quality prior
(a page on a well-linked domain is likelier to be worth keeping — the
classic complement to content-side filters like Gopher/CCNet). The
dedup family already has the other graph kernel (connected components,
operators/clustering.py — large-star/small-star); this adds the
iterative-rank kernel on the same edge-frame representation.

PageRank here is the standard damped power iteration with dangling-mass
redistribution:

    r_{t+1}(v) = (1-d)/N + d·(Σ_{u→v} r_t(u)/outdeg(u) + dangling_t/N)

Spark shape per iteration: one equijoin of the rank frame against the
edge frame on src (both sides hash-partitioned on the same key — the
edge side's partitioning is REUSED across all iterations once
materialized, so after iteration 1 only the small rank frame moves) and
one groupBy(dst) partial+final aggregate. The dangling mass is a scalar
(one-row aggregate joined back as a literal via crossJoin of a 1-row
frame — broadcast, free). Convergence is checked every ``check_every``
iterations with a bounded 1-row L1-delta aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def out_degrees(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    return edges.groupBy(src).agg(F.count(F.lit(1)).alias("outdeg"))


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    max_iter: int = 20,
    tol: float = 1e-6,
    src: str = "src",
    dst: str = "dst",
    check_every: int = 5,
) -> DataFrame:
    """Ranks for every node appearing as src or dst: (node, rank),
    Σ rank = 1. Deterministic; dangling nodes (no out-edges) donate
    their mass uniformly, the textbook formulation.

    ``edges`` are distinct directed links (duplicate edges would double
    a link's vote — dedupe upstream if the input may contain repeats).
    """
    nodes = (
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct()
        .localCheckpoint()  # node set reused every iteration
    )
    n = nodes.count()
    if n == 0:
        return edges.sparkSession.createDataFrame([], "node string, rank double")

    deg = out_degrees(edges, src, dst)
    # contribution edges carry 1/outdeg so the per-iteration join emits
    # rank·weight directly; materialized ONCE with its partitioning
    contrib = (
        edges.join(deg, src)
        .select(F.col(src).alias("node"), F.col(dst).alias("dst"), (1.0 / F.col("outdeg")).alias("w"))
        .repartition("node")
        .localCheckpoint()
    )
    has_out = deg.select(F.col(src).alias("node")).localCheckpoint()

    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank")).localCheckpoint()
    for it in range(max_iter):
        dangling = (
            ranks.join(has_out, "node", "left_anti").agg(F.sum("rank")).first()[0] or 0.0
        )
        inflow = (
            contrib.join(ranks, "node")
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("w")).alias("inflow"))
            .withColumnRenamed("dst", "node")
        )
        new_ranks = (
            nodes.join(inflow, "node", "left")
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (F.coalesce(F.col("inflow"), F.lit(0.0)) + F.lit(dangling / n))
                ).alias("rank"),
            )
            .localCheckpoint()
        )
        if (it + 1) % check_every == 0 or it == max_iter - 1:
            delta = (
                new_ranks.join(ranks.withColumnRenamed("rank", "prev"), "node")
                .agg(F.sum(F.abs(F.col("rank") - F.col("prev"))))
                .first()[0]
            )
            ranks = new_ranks
            if delta is not None and delta < tol:
                break
        else:
            ranks = new_ranks
    return ranks


def domain_authority(
    docs: DataFrame,
    edges: DataFrame,
    domain_col: str = "domain",
    damping: float = 0.85,
    max_iter: int = 20,
) -> DataFrame:
    """Attach a host-graph PageRank prior to a documents frame: the
    edge frame links registrable domains (src→dst); every doc gets its
    domain's rank as ``authority`` (docs on unknown domains get the
    minimum rank — no free boost for never-linked hosts). The rank
    table is |domains|-sized → broadcast; the corpus never shuffles."""
    ranks = pagerank(edges, damping=damping, max_iter=max_iter)
    floor_rank = ranks.agg(F.min("rank")).first()[0]
    return docs.join(
        F.broadcast(ranks.withColumnRenamed("node", domain_col)), domain_col, "left"
    ).withColumn("authority", F.coalesce("rank", F.lit(floor_rank))).drop("rank")
