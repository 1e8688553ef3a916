"""The end-to-end corpus-cleaning pipeline — the composition a 100 TB
training-data preparation run actually executes, wired from the
individual operators this package provides:

    quality gate (Gopher rules)          operators/quality.py
      -> exact dedup (content hash)      operators/dedup.py
      -> near-dup clusters -> canonical  dedup + clustering
      -> substring-span removal          operators/dedup.py

Each stage consumes the previous stage's survivors, so the expensive
stages (near-dup pair generation, span hashing) run on an
already-shrunk corpus — the standard ordering in production pipelines
(cheap per-doc filters first, cross-doc stages last).

Reference parity: the reference engine has no corpus pipeline; this is
the package's training-data extension surface exercised as one DAG.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .clustering import dedup_keep_canonical
from .dedup import exact_dedup, minhash_lsh_verified_pairs, remove_duplicate_spans
from .quality import gopher_filters
from pixie_spark.materialize import materialize

# Rules enforceable on synthetic / non-English corpora (the fixture
# corpus has no natural-language stop words, so the stop_words and
# alpha heuristics would empty it — a real English pipeline passes
# rules=None for the full set).
STRUCTURAL_RULES = [
    "word_count",
    "mean_word_length",
    "dup_line_frac",
    "dup_para_frac",
    "dup_line_char_frac",
    "dup_para_char_frac",
    "top_2gram",
    "top_3gram",
    "top_4gram",
    "dup_5gram",
    "dup_6gram",
    "dup_7gram",
    "dup_8gram",
    "dup_9gram",
    "dup_10gram",
]


def clean_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    quality_rules: list[str] | None = None,
    min_words: int = 50,
    shingle_n: int = 5,
    near_dup_threshold: float = 0.5,
    span_k: int = 10,
    checkpoint: bool = False,
) -> dict[str, DataFrame]:
    """Run the full cleaning DAG; returns every intermediate so callers
    can materialize the stage they need:

    - ``quality``:    per-doc stats + keep decision (all input rows)
    - ``after_quality``/``after_exact``/``after_near``: survivor corpora
    - ``near_pairs``: the verified near-dup pairs that drove clustering
    - ``clean``:      final corpus with duplicated spans removed
                      (doc, text, n_removed)

    Every stage is lazily composed — nothing executes until a returned
    frame is acted on; localCheckpoints inside the dedup operators cut
    the shared subtrees exactly where multiple consumers fork.
    ``checkpoint=True`` additionally materializes each stage boundary —
    the right mode when a caller will act on SEVERAL of the returned
    frames (a report counting every stage would otherwise recompute the
    minhash pipeline once per action).
    """

    def cp(frame: DataFrame) -> DataFrame:
        return frame.transform(materialize) if checkpoint else frame
    quality = gopher_filters(
        df, id_col, text_col, min_words=min_words, rules=quality_rules
    )
    keep_ids = quality.where("keep").select(F.col("doc").alias(id_col))
    after_quality = cp(df.join(keep_ids, id_col, "left_semi"))

    groups = exact_dedup(after_quality, id_col, [text_col])
    exact_keep = groups.select(F.col("keep_id").alias(id_col))
    after_exact = cp(after_quality.join(exact_keep, id_col, "left_semi"))

    near_pairs = minhash_lsh_verified_pairs(
        after_exact,
        id_col,
        text_col,
        n=shingle_n,
        num_hashes=64,
        bands=64,
        threshold=near_dup_threshold,
    )
    near_pairs = cp(near_pairs)
    after_near = cp(dedup_keep_canonical(after_exact, id_col, near_pairs))

    clean = remove_duplicate_spans(after_near, id_col, text_col, k=span_k)
    return {
        "quality": quality,
        "after_quality": after_quality,
        "after_exact": after_exact,
        "near_pairs": near_pairs,
        "after_near": after_near,
        "clean": clean,
    }


def clean_corpus_report(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    quality_rules: list[str] | None = None,
    min_words: int = 50,
    shingle_n: int = 5,
    near_dup_threshold: float = 0.5,
    span_k: int = 10,
) -> DataFrame:
    """One-row funnel report of the cleaning DAG: doc counts after each
    stage plus the total words removed by span dedup — the dashboard
    row a pipeline run publishes."""
    stages = clean_corpus(
        df, id_col, text_col, quality_rules, min_words, shingle_n,
        near_dup_threshold, span_k, checkpoint=True,
    )

    # ONE lazy query instead of 6 serial driver actions (5 counts + a
    # collect + a parallelize round-trip): each stage count is a 1-row
    # aggregate over its (already checkpointed) stage frame, and the
    # report row is their crossJoin — independent legs, so AQE runs
    # them as concurrent query stages inside the single action the
    # caller takes (r11 profile: the serial counts were pure driver
    # latency, the stage data is cached).
    def n(frame: DataFrame, name: str) -> DataFrame:
        return frame.agg(F.count(F.lit(1)).cast("long").alias(name))

    return (
        n(df, "n_input")
        .crossJoin(n(stages["after_quality"], "n_after_quality"))
        .crossJoin(n(stages["after_exact"], "n_after_exact"))
        .crossJoin(n(stages["near_pairs"], "n_near_pairs"))
        .crossJoin(n(stages["after_near"], "n_after_near"))
        .crossJoin(
            stages["clean"].agg(
                F.count(F.lit(1)).cast("long").alias("n_clean"),
                F.coalesce(F.sum("n_removed"), F.lit(0))
                .cast("long")
                .alias("words_removed_by_span_dedup"),
            )
        )
    )
