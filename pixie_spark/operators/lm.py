"""Hashed n-gram language-model perplexity scoring for training-data
quality filtering (the CCNet recipe: Wenzek et al. 2020, "CCNet:
Extracting High Quality Monolingual Datasets from Web Crawl Data" —
score every document with an LM trained on a trusted corpus, keep the
low-perplexity head). CCNet uses a KenLM 5-gram; this is the
distributed re-expression with a bigram stupid-backoff model (Brants et
al. 2007, "Large Language Models in Machine Translation" — the backoff
scheme designed for exactly this distributed-count setting).

Everything runs on 8-byte xxhash64 ids — no n-gram string is ever
shuffled (the dedup-family discipline, operators/dedup.py). Collisions
at 64 bits are negligible below ~2^32 distinct grams.

Scale design (100 TB corpus, 1000 executors):

- **Training** is two hash aggregations (unigram and bigram counts, both
  map-side-combined so the shuffle carries ~|vocab| rows per partition,
  Zipf-bounded) plus one 8-byte-key join to attach context counts. A
  ``min_count`` prune drops the hapax tail — the standard KenLM pruning —
  which bounds the model to the Zipf head.
- **Scoring** joins the document bigram stream against the model tables
  on 8-byte keys. The pruned model is typically small enough that AQE
  converts both joins to broadcasts automatically; no collect, no
  driver-side model object — the "model" IS a pair of DataFrames, so it
  also scales when it does NOT fit in one executor (plain shuffle join).
- The mean-logprob aggregation reuses the window shuffle's by-doc
  partitioning (no extra exchange).

Reference parity note: the reference engine (pixie-io/pixie) has no LM
operators; this extends the engine toward LLM-data preparation in the
same native-expression style as its scalar builtins
(src/carnot/funcs/builtins/string_ops.cc).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import _word_rows
from pixie_spark.materialize import materialize

# Stupid-backoff discount (Brants et al. 2007 use 0.4 and note
# insensitivity to the exact value).
BACKOFF_ALPHA = 0.4


def _token_stream(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc, pos, uid, bid) rows: uid = hash(word), bid = hash(word, next)
    (null at the last position). Lowercased so 'The'/'the' share mass.
    One window shuffle on doc."""
    # by_doc=False (r11, measured): the doc-keyed pre-partition regressed
    # this path 1.6× at sf0.1 — the token stream feeds several SHORT
    # per-uid/per-bid aggregation stages whose per-task fixed cost
    # (generated-code warmup) outweighs the map-side parallelism on a
    # pinned 32-way layout; AQE's coalesced layout measured faster.
    w = _word_rows(
        df.select(F.col(id_col), F.lower(F.col(text_col)).alias(text_col)),
        id_col,
        text_col,
        by_doc=False,
    )
    win = Window.partitionBy("doc").orderBy("pos")
    return w.select(
        "doc",
        "pos",
        F.xxhash64("word").alias("uid"),
        F.xxhash64("word", F.lead("word", 1).over(win)).alias("bid"),
        F.lead("word", 1).over(win).isNotNull().alias("has_next"),
    ).withColumn("bid", F.when(F.col("has_next"), F.col("bid"))).drop("has_next")


@dataclass
class HashedBigramLM:
    """A trained LM as two DataFrames plus two scalars.

    ``unigrams``: (uid, log_puni) — add-one unigram log-probability
    ln((c+1)/(N+V+1)); the +1s reserve mass for OOV words, whose
    log-probability is the constant ``log_oov``.
    ``bigrams``: (bid, log_cond) — ln(c(w1 w2)/c(w1)), exact conditional.
    """

    unigrams: DataFrame
    bigrams: DataFrame
    total_tokens: int
    vocab_size: int

    @property
    def log_oov(self) -> float:
        return math.log(1.0 / (self.total_tokens + self.vocab_size + 1))


def ngram_lm_train(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", min_count: int = 1
) -> HashedBigramLM:
    """Train the bigram stupid-backoff LM on a (trusted) corpus.

    ``min_count`` prunes bigrams seen fewer times (KenLM-style pruning;
    unigrams are never pruned so backoff stays well-defined). The two
    driver-side scalars (N, V) come from one tiny aggregate — the model
    tables themselves never leave the cluster.
    """
    toks = _token_stream(df, id_col, text_col).transform(materialize)
    uni = toks.groupBy("uid").agg(F.count("*").alias("c1"))
    n, v = toks.groupBy().agg(F.count("*"), F.countDistinct("uid")).first()
    # bigram conditional: join counts on the CONTEXT unigram (8-byte key)
    bi = (
        toks.where(F.col("bid").isNotNull())
        .groupBy("bid")
        .agg(F.count("*").alias("c2"), F.first("uid").alias("ctx_uid"))
    )
    if min_count > 1:
        bi = bi.where(F.col("c2") >= min_count)
    bigrams = (
        bi.join(uni, bi["ctx_uid"] == uni["uid"], "inner")
        .select("bid", (F.log(F.col("c2") / F.col("c1"))).alias("log_cond"))
    )
    unigrams = uni.select(
        "uid", F.log((F.col("c1") + 1) / F.lit(float(n + v + 1))).alias("log_puni")
    )
    return HashedBigramLM(
        unigrams=unigrams, bigrams=bigrams, total_tokens=int(n), vocab_size=int(v)
    )


def lm_score(
    df: DataFrame, lm: HashedBigramLM, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document perplexity under the LM: (id_col, n_tokens, log_prob,
    perplexity).

    Token 0 scores as a unigram; token i>0 as stupid backoff
    S(w_i | w_{i-1}) = c(w_{i-1} w_i)/c(w_{i-1}) if the bigram survived
    training, else ALPHA * P_uni(w_i). perplexity = exp(-mean ln S) —
    low = fluent under the training corpus (CCNet keeps the head).
    Empty documents score null.
    """
    toks = _token_stream(df, id_col, text_col)
    win = Window.partitionBy("doc").orderBy("pos")
    # the bigram ENDING at position i is the previous row's bid
    pos = toks.withColumn("prev_bid", F.lag("bid", 1).over(win))
    # no explicit broadcast hint: a min_count-pruned model is small and AQE
    # auto-broadcasts it; an unpruned web-scale model falls back to a plain
    # 8-byte-key shuffle join — both plans are right at their scale
    scored = (
        pos.join(lm.bigrams.alias("b"), pos["prev_bid"] == F.col("b.bid"), "left")
        .join(lm.unigrams.alias("u"), pos["uid"] == F.col("u.uid"), "left")
        .select(
            "doc",
            F.coalesce(
                F.col("log_cond"),
                F.lit(math.log(BACKOFF_ALPHA))
                + F.coalesce(F.col("log_puni"), F.lit(lm.log_oov)),
                # first token of a doc: no backoff penalty, plain unigram
            ).alias("lp_backoff"),
            F.coalesce(F.col("log_puni"), F.lit(lm.log_oov)).alias("lp_uni"),
            F.col("prev_bid").isNull().alias("is_first"),
        )
        .select(
            "doc",
            F.when(F.col("is_first"), F.col("lp_uni")).otherwise(F.col("lp_backoff")).alias("lp"),
        )
    )
    return scored.groupBy(F.col("doc").alias(id_col)).agg(
        F.count("*").alias("n_tokens"),
        F.sum("lp").alias("log_prob"),
        F.exp(-F.avg("lp")).alias("perplexity"),
    )


def perplexity_filter(
    df: DataFrame,
    lm: HashedBigramLM,
    max_perplexity: float,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Keep documents whose perplexity under ``lm`` is ≤ the threshold —
    the CCNet head/middle cut. Returns the original rows + the score
    columns (join back on the id, 8-byte-ish key)."""
    scores = lm_score(df, lm, id_col=id_col, text_col=text_col)
    return df.join(scores, id_col, "inner").where(F.col("perplexity") <= max_perplexity)


def perplexity_buckets(
    df: DataFrame,
    lm: HashedBigramLM,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str | None = None,
    cuts: tuple[float, float] = (1.0 / 3.0, 2.0 / 3.0),
    exact_cuts: bool = False,
    round_to: int | None = None,
) -> DataFrame:
    """CCNet's head/middle/tail partition (Wenzek et al. 2020 §4.3):
    bucket each document by where its perplexity falls among the
    percentiles of ITS GROUP (CCNet buckets per language — pass
    ``group_col``; None buckets against the whole corpus). head = most
    fluent third, tail = least.

    Cut points come from percentile_approx over the score frame — a
    mergeable-sketch aggregate (one pass, partial+final, the same
    two-phase shape as every UDA here) — then bucketing is a native
    when-chain against the per-group cut literals joined back (groups
    are dimension-sized → broadcast). Output: original rows +
    (n_tokens, perplexity, bucket).
    """
    scores = df.join(lm_score(df, lm, id_col=id_col, text_col=text_col), id_col)
    if round_to is not None:
        _sc = float(10**round_to)
        scores = scores.withColumn(
            "perplexity", F.floor(F.col("perplexity") * _sc + F.lit(0.5)) / F.lit(_sc)
        )
    keys = [group_col] if group_col else []
    if exact_cuts:
        # oracle-parity switch (the quantiles gate-row convention):
        # exact percentile instead of the sketch, cut points re-rounded
        # so an independent SQL engine lands on identical boundaries;
        # the production path stays the mergeable sketch (default)
        _cut = F.percentile("perplexity", F.lit(list(cuts)))
        if round_to is not None:
            _sc = float(10**round_to)
            _cut = F.transform(
                _cut, lambda c: F.floor(c * F.lit(_sc) + F.lit(0.5)) / F.lit(_sc)
            )
    else:
        _cut = F.percentile_approx("perplexity", list(cuts), 10_000)
    agg = [_cut.alias("__cuts")]
    cut_rows = scores.groupBy(*keys).agg(*agg) if keys else scores.agg(*agg)
    joined = (
        scores.join(F.broadcast(cut_rows), keys) if keys else scores.crossJoin(F.broadcast(cut_rows))
    )
    lo = F.element_at("__cuts", 1)
    hi = F.element_at("__cuts", 2)
    return joined.withColumn(
        "bucket",
        F.when(F.col("perplexity") <= lo, "head")
        .when(F.col("perplexity") <= hi, "middle")
        .otherwise("tail"),
    ).drop("__cuts")
