"""Per-stage timing breakdown of the corpus-cleaning funnel (round-9
verdict #3: corpus_clean_pipeline is the registry's highest sf1 wall —
18.4 s committed median, 18.6-30.7 s across judge re-runs — profile it
stage by stage and either reduce it or document the floor with the
dominant stage named).

clean_corpus_report runs with checkpoint=True, so every stage boundary
is already a materialization cut; this tool times each cut separately
by forcing the stages in dependency order (each stage's own time is
what its materialization adds once its inputs are already pinned —
exactly the stage cost a production run pays). Repeats + medians use
bench.py's methodology.

Usage: python -m tools.profile_pipeline [sf_dir] [repeats]
Prints a JSON stage-time table; paste into SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pixie_spark.operators.pipeline import STRUCTURAL_RULES
from pixie_spark.session import get_spark
from pixie_spark.sources import load_table


def profile_once(spark, sf_dir: str) -> dict[str, float]:
    # NOTE: this hand-unrolls pipeline.clean_corpus's stage DAG — the
    # composition cannot be reused directly because each stage must be
    # timed from PINNED inputs (clean_corpus composes lazily, so timing
    # its returned frames would charge stage N for re-running N-1).
    # The stage list and hyperparameters below MUST mirror
    # queries.q_corpus_clean_pipeline's production override
    # (bench.py _clean_pipeline_production: STRUCTURAL_RULES,
    # min_words=5, n=5/64 hashes/64 bands/t=0.5, span k=10) — update
    # BOTH when the funnel changes, or the published stage table
    # profiles a different pipeline than the bench times.
    from pixie_spark.materialize import materialize

    doc = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # force in dependency order; each frame is cut AFTER timing so the
    # next stage starts from pinned inputs and pays only its own cost
    out: dict[str, float] = {}
    pinned: dict[str, object] = {}

    def stage(name: str, frame):
        t0 = time.time()
        cut = materialize(frame)
        out[name] = round(time.time() - t0, 3)
        pinned[name] = cut
        return cut

    from pixie_spark.operators.clustering import dedup_keep_canonical
    from pixie_spark.operators.dedup import (
        exact_dedup,
        minhash_lsh_verified_pairs,
        remove_duplicate_spans,
    )
    from pixie_spark.operators.quality import gopher_filters

    quality = gopher_filters(doc, "doc_id", "text", min_words=5, rules=STRUCTURAL_RULES)
    keep_ids = quality.where("keep").select(F.col("doc").alias("doc_id"))
    after_quality = stage("1_quality_gate", doc.join(keep_ids, "doc_id", "left_semi"))

    groups = exact_dedup(after_quality, "doc_id", ["text"])
    exact_keep = groups.select(F.col("keep_id").alias("doc_id"))
    after_exact = stage(
        "2_exact_dedup", after_quality.join(exact_keep, "doc_id", "left_semi")
    )

    near_pairs = stage(
        "3_minhash_pairs",
        minhash_lsh_verified_pairs(
            after_exact, "doc_id", "text", n=5, num_hashes=64, bands=64, threshold=0.5
        ),
    )
    after_near = stage(
        "4_cluster_canonical", dedup_keep_canonical(after_exact, "doc_id", near_pairs)
    )
    clean = stage("5_span_removal", remove_duplicate_spans(after_near, "doc_id", "text", k=10))
    t0 = time.time()
    clean.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.sum("n_removed"), F.lit(0)).alias("w"),
    ).collect()
    out["6_report_agg"] = round(time.time() - t0, 3)
    out["total"] = round(sum(out.values()), 3)
    for f in pinned.values():
        try:
            f.unpersist()
        except Exception:
            pass
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("pipeline_profile")
    runs = [profile_once(spark, sf_dir) for _ in range(repeats)]
    keys = runs[0].keys()

    def med(xs):
        s = sorted(xs)
        m = len(s) // 2
        return s[m] if len(s) % 2 else round((s[m - 1] + s[m]) / 2, 3)

    table = {
        k: {"median": med([r[k] for r in runs]),
            "min": min(r[k] for r in runs),
            "max": max(r[k] for r in runs)}
        for k in keys
    }
    print(json.dumps({"sf_dir": sf_dir, "repeats": repeats, "stages": table}, indent=1))


if __name__ == "__main__":
    main()
