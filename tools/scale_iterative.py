"""Measured scale-up for the ITERATIVE kernels (SCALE.md round-5 row):
connected components, PageRank, BPE train at 1x and 10x input size —
the question is whether ROUND counts stay flat-to-log and wall clock
stays sub-linear, and whether driver-held state grows with the data
(it must not: CC holds one checksum row per round, PageRank one delta
row per check, BPE a Zipf-bounded vocab).

Usage: python tools/scale_iterative.py   (prints a markdown table)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pixie_spark.operators.clustering import connected_components
from pixie_spark.operators.graph import pagerank
from pixie_spark.operators.text import bpe_train
from pixie_spark.session import get_spark
from pixie_spark.sources import load_table


def synth_edges(spark, n_nodes: int, seed: int = 7):
    """Deterministic sparse graph: ~3 edges per node via hash arithmetic
    (chain + two pseudo-random jumps) — components of nontrivial size."""
    ids = spark.range(n_nodes).select(F.col("id").alias("a"))
    e1 = ids.select("a", ((F.col("a") + 1) % n_nodes).alias("b"))  # chain pieces
    e1 = e1.where(F.col("a") % 97 != 0)  # break the chain into segments
    e2 = ids.select(
        "a", F.pmod(F.xxhash64("a", F.lit(seed)), F.lit(n_nodes)).alias("b")
    ).where(F.col("a") % 5 == 0)
    return e1.unionByName(e2).where(F.col("a") != F.col("b")).localCheckpoint()


def time_cc(spark, n):
    edges = synth_edges(spark, n).withColumnRenamed("a", "doc_a").withColumnRenamed("b", "doc_b")
    stats: dict = {}
    t0 = time.time()
    out = connected_components(edges, max_iter=30, stats=stats)
    n_comp = out.select("component").distinct().count()
    return time.time() - t0, stats.get("rounds"), n_comp


def time_pr(spark, n):
    edges = synth_edges(spark, n).toDF("src", "dst")
    t0 = time.time()
    ranks = pagerank(edges, max_iter=10, check_every=5, tol=0.0)
    total = ranks.agg(F.sum("rank")).first()[0]
    return time.time() - t0, 10, total


def time_bpe(spark, docs):
    t0 = time.time()
    merges = bpe_train(docs, num_merges=60)
    return time.time() - t0, len(merges)


def main():
    spark = get_spark("scale_iterative")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    docs = load_table(spark, sf, "documents").select("doc_id", "text").localCheckpoint()
    docs10 = docs
    for i in range(1, 10):
        docs10 = docs10.unionByName(
            docs.select((F.col("doc_id") + 10_000_000 * i).alias("doc_id"), "text")
        )
    docs10 = docs10.localCheckpoint()

    print("| kernel | 1x wall s | 10x wall s | ratio | rounds 1x | rounds 10x |")
    print("|---|---|---|---|---|---|")

    # warm both sizes once (codegen/JVM warmup), then measure
    for fn, label, args1, args10, has_rounds in [
        (time_cc, "connected components (100k→1M nodes)", 100_000, 1_000_000, True),
        (time_pr, "pagerank 10 iters (100k→1M nodes)", 100_000, 1_000_000, True),
    ]:
        fn(get_spark("scale_iterative"), args1)  # warm
        w1, r1, x1 = fn(spark, args1)
        w10, r10, x10 = fn(spark, args10)
        print(
            f"| {label} | {w1:.1f} | {w10:.1f} | {w10 / w1:.1f} | {r1} | {r10} |"
        )
    time_bpe(spark, docs.limit(500))  # warm
    w1, m1 = time_bpe(spark, docs)
    w10, m10 = time_bpe(spark, docs10)
    print(
        f"| bpe train 60 merges (sf0.1 docs → ×10) | {w1:.1f} | {w10:.1f} "
        f"| {w10 / w1:.1f} | {m1} | {m10} |"
    )


if __name__ == "__main__":
    main()
