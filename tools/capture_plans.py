"""Capture .explain('formatted') output for registry queries into
plans/<round>/<query>_<tag>.txt — the before/after evidence files the
optimization rounds commit (the judge checks plan claims against these).

Usage:
    python tools/capture_plans.py --out plans/r11 --tag before q1 q2 ...
    python tools/capture_plans.py --out plans/r11 --tag before --all-heavy
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEAVY = [
    # headline
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_embedding_cosine_lsh",
    "ann_cosine_topk",
    "corpus_preprocess",
    "text_stats",
    "window_rank_topn_per_group",
    "multi_join_star",
    "agg_groupby",
    "join_inner",
    "quantiles",
    "json_ops",
    # heavy extras
    "gopher_quality",
    "ts_anomalies",
    "ts_resample_ffill",
    "lm_perplexity",
    "nb_classify",
    "dedup_substring",
    "dedup_lines_ccnet",
    "corpus_diversity",
    "training_shards",
    "term_freq_cms",
    "decontaminate_spans",
    "rollup_cascade",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--out", default="plans/r11")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--all-heavy", action="store_true")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    names = list(args.queries)
    if args.all_heavy:
        names.extend(q for q in HEAVY if q not in names)
    os.makedirs(args.out, exist_ok=True)

    from pixie_spark.queries import QUERIES
    from pixie_spark.session import get_spark

    spark = get_spark("pixie_spark_plans")
    for name in names:
        fn = QUERIES[name].fn
        try:
            df = fn(spark, args.sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001 — record the failure, keep going
            plan = f"PLAN CAPTURE FAILED: {type(e).__name__}: {e}"
        path = os.path.join(args.out, f"{name}_{args.tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")


if __name__ == "__main__":
    main()
