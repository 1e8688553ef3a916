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
one groupBy(dst) partial+final aggregate. The dangling mass is a 1-row
aggregate FRAME folded into the rank-update plan via broadcast
crossJoin — it never touches the driver, so each iteration runs exactly
ONE driver action (the localCheckpoint that materializes the new
ranks). When the graph has NO dangling nodes (decided once up front —
the dangling set is fixed across iterations) the mass is exactly 0.0
every round and the whole dangling leg is skipped, bit-identically. The per-node L1 delta is computed as a column of that same
materialization; convergence checks every ``check_every`` iterations
read it back with a cheap cached-scan aggregate (asserted in
tests/test_graph.py by counting Spark jobs per iteration).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pixie_spark.materialize import materialize


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
        .transform(materialize)  # node set reused every iteration
    )
    n = nodes.count()
    if n == 0:
        return edges.sparkSession.createDataFrame([], "node string, rank double")

    deg = out_degrees(edges, src, dst)
    # contribution edges carry 1/outdeg so the per-iteration join emits
    # rank·weight directly; materialized ONCE with its partitioning
    # explicit partition count (r11): a numberless repartition is
    # AQE-coalesced by bytes, and the coalesced layout rarely matches
    # the rank frame's join partitioning — every iteration then
    # re-exchanged the edge side. Pinning at the configured shuffle
    # parallelism keeps the iteration joins co-partitioned.
    from pixie_spark.partitioning import by_key

    contrib = (
        edges.join(deg, src)
        .select(F.col(src).alias("node"), F.col(dst).alias("dst"), (1.0 / F.col("outdeg")).alias("w"))
        .transform(by_key, "node")
        .transform(materialize)
    )
    has_out = deg.select(F.col(src).alias("node")).transform(materialize)
    # the dangling-node SET (nodes − has_out) is fixed across iterations;
    # when it is empty the dangling mass is exactly 0.0 every round, and
    # `x + 0.0` is an IEEE no-op for the non-negative inflow values, so
    # the per-iteration anti-join + 1-row aggregate + broadcast crossJoin
    # can be skipped outright with BIT-IDENTICAL ranks (r11: ~2-3 AQE
    # stage-jobs saved per iteration on a dangling-free graph — the
    # common shape for host link graphs, where every node in the edge
    # list has out-links). has_out ⊆ nodes by construction, so one cheap
    # count over the already-materialized frame decides the path.
    n_dangling = n - has_out.count()

    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank")).transform(materialize)
    # release= must receive the frame materialize() RETURNED — on check
    # rounds `ranks` becomes a derived .drop('__delta') projection, and
    # DataFrame.unpersist on a derived plan would not release the
    # underlying persisted copy
    ranks_mat = ranks
    for it in range(max_iter):
        inflow = (
            contrib.join(ranks, "node")
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("w")).alias("inflow"))
            .withColumnRenamed("dst", "node")
        )
        if n_dangling:
            # dangling mass as a 1-ROW FRAME, broadcast-crossJoined into
            # the update plan — no .first() round-trip; the scalar is
            # computed inside the same job that materializes the new ranks
            dangling = ranks.join(has_out, "node", "left_anti").agg(
                F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dangling")
            )
            damp_term = F.coalesce(F.col("inflow"), F.lit(0.0)) + F.col(
                "__dangling"
            ) / F.lit(float(n))
        else:
            damp_term = F.coalesce(F.col("inflow"), F.lit(0.0))
        rank_expr = F.lit((1.0 - damping) / n) + F.lit(damping) * damp_term
        check = (it + 1) % check_every == 0 or it == max_iter - 1
        updated = nodes.join(inflow, "node", "left")
        if check:
            # L1 delta rides the same materialization (one extra co-
            # partitioned join on check rounds only); the aggregate below
            # re-scans cached checkpoint blocks, no recompute
            updated = updated.join(ranks.withColumnRenamed("rank", "__prev"), "node")
            cols = [
                rank_expr.alias("rank"),
                F.abs(rank_expr - F.col("__prev")).alias("__delta"),
            ]
        else:
            cols = [rank_expr.alias("rank")]
        if n_dangling:
            updated = updated.crossJoin(F.broadcast(dangling))
        new_ranks = (
            updated.select("node", *cols)
            # the iteration's ONE driver action; truncation required —
            # the plan would otherwise nest one join tree per iteration.
            # The superseded round's frame is released so a long run
            # holds 2 materializations, not n_iter (persist/checkpoint
            # strategies would otherwise accumulate one copy per round).
            .transform(materialize, require_truncation=True, release=ranks_mat)
        )
        ranks_mat = new_ranks
        ranks = new_ranks.drop("__delta") if check else new_ranks
        if check:
            delta = new_ranks.agg(F.sum("__delta")).first()[0]
            if delta is not None and delta < tol:
                break
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
    # the floor is a 1-row broadcast frame too — no extra driver action
    floor_rank = ranks.agg(F.min("rank").alias("__floor"))
    return (
        docs.join(
            F.broadcast(ranks.withColumnRenamed("node", domain_col)), domain_col, "left"
        )
        .crossJoin(F.broadcast(floor_rank))
        .withColumn("authority", F.coalesce("rank", F.col("__floor")))
        .drop("rank", "__floor")
    )
