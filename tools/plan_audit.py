"""Plan auditor: captures the physical-plan properties that make each
headline query scale — the `.explain("formatted")` review the repo's
workflow requires, persisted as an artifact (PLANS.md) a reviewer can
read without running Spark.

For every audited query it extracts the operator tree skeleton and
greps the load-bearing properties:

- PushedFilters / ReadSchema       (scan pushdown + column pruning)
- partial+final HashAggregate      (map-side combine)
- BroadcastHashJoin / SortMergeJoin / BroadcastNestedLoopJoin
- TakeOrderedAndProject            (top-k without global sort)
- Exchange count + SinglePartition (shuffle discipline)
- EvalPython / ArrowEvalPython     (Python in the plan)
- CartesianProduct                 (must never appear)

Usage: python tools/plan_audit.py [sf_dir] > PLANS.md
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pixie_spark.queries import QUERIES
from pixie_spark.session import get_spark

# Files whose content determines the audited plans: when any of these
# change, PLANS.md must be regenerated IN THE SAME COMMIT — CI enforces
# it by recomputing this stamp and comparing with the one PLANS.md
# carries (round-8 verdict #2: the committed dedup-family plans had
# gone stale against a same-round operator rewrite).
_STAMP_GLOBS = [
    "pixie_spark/queries.py",
    "pixie_spark/session.py",
    "pixie_spark/materialize.py",
    "pixie_spark/operators/*.py",
    "pixie_spark/sources/*.py",
    "pixie_spark/functions/*.py",
    # the auditor itself: edits to AUDITED or the grep logic must also
    # force a regeneration, or the guard can't see its own staleness
    "tools/plan_audit.py",
]


def source_stamp() -> str:
    """16-hex digest over the plan-determining source files (sorted,
    path-prefixed) — embedded into PLANS.md at generation time and
    re-checked by tests/test_plans.py."""
    import glob
    import hashlib

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    h = hashlib.sha256()
    for pattern in _STAMP_GLOBS:
        for path in sorted(glob.glob(os.path.join(root, pattern))):
            h.update(os.path.relpath(path, root).encode())
            with open(path, "rb") as f:
                h.update(f.read())
    return h.hexdigest()[:16]


AUDITED = [
    "memory_source_scan",
    "agg_groupby",
    "join_inner",
    "multi_join_star",
    "limit_topn",
    "window_rank_topn_per_group",
    "rolling_time_bin",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_embedding_cosine_lsh",
    "ann_cosine_topk",
    "asof_join",
    "sessionize",
    "corpus_preprocess",
    "text_stats",
    "sequence_packing",
    "training_shards",
    "term_freq_cms",
    "contamination_check",
    "ts_pattern_search",
    "ts_resample_ffill",
    "corpus_diversity",
    "domain_pagerank",
    "epoch_expansion",
    "doc_chunking",
    # round-5 rewrites: per-cluster BLAS SemDeDup, NB scoring, the
    # composed cleaning funnel
    "semantic_dedup",
    "nb_classify",
    "corpus_clean_pipeline",
    # round-5 additions: C4 cleaning front + corpus-wide line dedup
    "normalize_corpus",
    "c4_quality_clean",
    "dedup_lines",
    "dedup_lines_ccnet",
    "leakage_safe_split",
    "perplexity_buckets",
    # round-6: exact-distinct rollup cascade (gate config) + the
    # incremental MinHash pipeline now under a local oracle
    "rollup_cascade",
    "dedup_incremental",
    "temperature_mix",
    "mixture_shards",
    # round-8: IVF-PQ graduated to a local oracle (lossless parity mode)
    "ann_ivfpq_topk",
]


def skeleton(plan: str, max_lines: int = 40) -> list[str]:
    """The operator-tree part of a formatted plan (before the per-node
    detail sections)."""
    lines = []
    for ln in plan.splitlines():
        if ln.startswith("(1) ") or ln.startswith("(1)"):
            break
        if ln.strip() and not ln.startswith("=="):
            lines.append(ln.rstrip())
    return lines[:max_lines]


def _bad_single_partition(plan: str) -> bool:
    """A SinglePartition exchange is the scale trap ONLY when wide data
    funnels through it. The final stage of a GLOBAL aggregate is the
    legitimate exception: its input is the map-side partials (a handful
    of rows per task). In toString trees the child prints after the
    parent, so check the lines following each SinglePartition exchange
    for a partial HashAggregate feeding it."""
    lines = plan.splitlines()
    for i, ln in enumerate(lines):
        if "Exchange SinglePartition" not in ln:
            continue
        child = "\n".join(lines[i + 1 : i + 4])
        if "HashAggregate" in child and "partial_" in child:
            continue  # global-agg final stage: partials only
        return True
    return False


def props(plan: str) -> dict[str, object]:
    exchanges = len(re.findall(r"\bExchange\b", plan))
    return {
        "pushed_filters": "PushedFilters: [" in plan and "PushedFilters: []" not in plan,
        "partial_final_agg": "partial_" in plan and plan.count("HashAggregate") >= 2,
        "broadcast_join": "BroadcastHashJoin" in plan,
        "sort_merge_join": "SortMergeJoin" in plan,
        "take_ordered": "TakeOrderedAndProject" in plan,
        "exchanges": exchanges,
        "single_partition_exchange": _bad_single_partition(plan),
        "python_eval": "EvalPython" in plan,
        "arrow_python": "ArrowEvalPython" in plan,
        "cartesian": "CartesianProduct" in plan,
        "partition_filters": bool(re.search(r"PartitionFilters: \[[^\]]", plan)),
    }


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("plan_audit")
    print("# PLANS — physical-plan audit of representative queries")
    print()
    print(f"Generated by tools/plan_audit.py at {sf_dir} (re-run to refresh).")
    print("Properties greped from `explain('formatted')`; the same")
    print("properties are ASSERTED in tests/test_plans.py — this file is")
    print("the human-readable record.")
    print()
    print(f"Source stamp: `{source_stamp()}` — recomputed by")
    print("tests/test_plans.py::test_plans_md_freshness; a mismatch means an")
    print("audited source file changed after this file was generated.")
    for name in AUDITED:
        if name not in QUERIES:
            continue
        df = QUERIES[name].fn(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        formatted_props = props(plan)
        print(f"\n## {name}\n")
        flags = []
        if formatted_props["pushed_filters"]:
            flags.append("scan pushdown")
        if formatted_props["partial_final_agg"]:
            flags.append("partial+final agg")
        if formatted_props["broadcast_join"]:
            flags.append("broadcast join")
        if formatted_props["sort_merge_join"]:
            flags.append("sort-merge join")
        if formatted_props["take_ordered"]:
            flags.append("TakeOrdered top-k")
        if formatted_props["partition_filters"]:
            flags.append("partition pruning")
        flags.append(f"{formatted_props['exchanges']} exchange(s)")
        warn = []
        if formatted_props["single_partition_exchange"]:
            warn.append("SINGLE-PARTITION EXCHANGE")
        if formatted_props["python_eval"] and not formatted_props["arrow_python"]:
            warn.append("ROW-PYTHON UDF")
        if formatted_props["arrow_python"]:
            warn.append("arrow-batched python (allowed: quantizer/decode)")
        if formatted_props["cartesian"]:
            warn.append("CARTESIAN")
        print(f"- properties: {', '.join(flags)}")
        if warn:
            print(f"- notes: {', '.join(warn)}")
        print("\n```")
        # physical plan string form: take the tree lines only
        tree = [
            ln
            for ln in plan.splitlines()
            if ("+-" in ln or ln.startswith("*") or "AdaptiveSparkPlan" in ln)
        ][:32]
        print("\n".join(tree))
        print("```")
    return 0


if __name__ == "__main__":
    sys.exit(main())
