"""Hashed-feature multinomial Naive Bayes text classifier — the
fastText-shaped linear classifier (Joulin et al. 2017, "Bag of Tricks
for Efficient Text Classification") that production corpus pipelines
use for quality / domain / language filtering (e.g. the GPT-3 and LLaMA
data recipes both describe a linear quality classifier over n-gram
features). Naive Bayes is the closed-form member of that family: one
counting pass instead of SGD, which makes training a pure Spark
aggregation — no parameter server, no iteration.

Everything runs on 8-byte xxhash64 feature ids (unigrams + bigrams via
the same window machinery as operators/lm.py — no feature string is
ever shuffled).

Scale design (100 TB labeled corpus, 1000 executors):

- **Train**: one map-side-combined groupBy((label, fid)) count — the
  shuffle carries ~|classes|·|vocab| partial rows, Zipf-bounded — plus
  a tiny per-label total. ``min_count`` prunes the hapax tail
  (bounding the model like KenLM pruning bounds the LM). The model is
  a DataFrame of (fid, per-class log-likelihood array), never a
  driver-side object.
- **Score**: one join of the document feature stream against the model
  on the 8-byte fid (AQE auto-broadcasts the pruned model), then a
  per-doc element-wise array-sum aggregate and a native argmax — no
  Python UDF anywhere. OOV features contribute the smoothed floor,
  folded in as closed-form per-class constants instead of rows.
- Laplace (add-one) smoothing keeps every probability finite and the
  whole computation exactly reproducible — pinned against a pure-Python
  Counter reference in tests/test_classifier.py.

Reference parity note: the reference engine has no trainable
classifier; nearest is its static n-gram language heuristic
re-expressed in operators/text.lang_id. This operator is the trained,
label-general version of that idea.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import _word_rows
from pixie_spark.materialize import materialize


def _feature_rows(
    df: DataFrame, id_col: str, text_col: str, carry: tuple[str, ...] = ()
) -> DataFrame:
    """(doc, *carry, fid) rows: unigram and bigram hashed features,
    lowercased. One window shuffle on doc (bigrams via lead, the lm.py
    machinery). Repeated features count once per OCCURRENCE
    (multinomial NB).

    r12 shape: ONE pass — each word row explodes into [uni, bi?]
    in-row. The previous union of a unigram and a bigram branch
    duplicated the whole window subtree in the plan (no CSE across
    union children), so the per-doc sort and both hashes were computed
    TWICE (profiled: the two heaviest nb_classify stages were exactly
    this subtree, ~24 s task CPU at sf0.1). Same output multiset —
    downstream consumers aggregate per (doc)/(label, fid), so row order
    never mattered.
    """
    w = _word_rows(
        df.select(F.col(id_col), *carry, F.lower(F.col(text_col)).alias(text_col)),
        id_col,
        text_col,
        carry=carry,
    )
    win = Window.partitionBy("doc").orderBy("pos")
    nxt = F.lead("word", 1).over(win)
    base = w.select(
        "doc",
        *carry,
        F.array_compact(
            F.array(
                F.xxhash64("word"),
                F.when(nxt.isNotNull(), F.xxhash64("word", nxt)),
            )
        ).alias("__fids"),
    )
    return base.select("doc", *carry, F.explode("__fids").alias("fid"))


@dataclass
class HashedNaiveBayes:
    """(fid → per-class feature log-likelihood) plus per-class scalars.

    ``weights``: DataFrame (fid, llh: array<double>) where
    llh[i] = ln((c(fid, class_i)+1)/(T_i+V+1)) − oov_i — the per-class
    log-likelihood DELTA over the OOV floor, so scoring only sums rows
    that matched and adds n_features·oov_i + prior_i in closed form.
    ``labels``: class names, fixed order. ``log_prior``/``log_oov``:
    per-class constants in that order.
    """

    weights: DataFrame
    labels: list[str]
    log_prior: list[float]
    log_oov: list[float]


def naive_bayes_train(
    df: DataFrame,
    label_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 1,
) -> HashedNaiveBayes:
    """One counting pass over the labeled corpus → the model DataFrame.

    Driver-side state is O(|classes|): label totals and priors. The
    (fid × class) table stays distributed.
    """
    # label carried THROUGH the explode (r12): the former join of the
    # exploded feature stream back to the corpus on doc re-scanned and
    # hash-joined every feature row for one narrow column
    feats = _feature_rows(
        df.select(
            F.col(id_col), F.col(label_col).alias("_lbl"), F.col(text_col)
        ),
        id_col,
        text_col,
        carry=("_lbl",),
    )
    counts = feats.groupBy("_lbl", "fid").agg(F.count("*").alias("c")).transform(materialize)
    if min_count > 1:
        keep = counts.groupBy("fid").agg(F.sum("c").alias("tc")).where(F.col("tc") >= min_count)
        counts = counts.join(keep.select("fid"), "fid")
    # per-class scalars: token totals + shared vocab size in ONE action
    # over the checkpointed counts (r11: they were two serial driver
    # jobs; the union costs nothing — both branches re-scan cached
    # blocks) — the vocab row rides along with a NULL label
    tot_rows = (
        counts.groupBy("_lbl")
        .agg(F.sum("c").alias("t"))
        .withColumn("__vocab_row", F.lit(False))
        .unionByName(
            counts.agg(
                F.first("_lbl").alias("_lbl"),  # ignored; keeps the schema
                F.count_distinct("fid").alias("t"),
            ).withColumn("__vocab_row", F.lit(True))
        )
        .collect()
    )
    totals = {r["_lbl"]: r["t"] for r in tot_rows if not r["__vocab_row"]}
    vocab = next(r["t"] for r in tot_rows if r["__vocab_row"])
    docs = {r[label_col]: r["n"] for r in df.groupBy(label_col).agg(F.count("*").alias("n")).collect()}
    labels = sorted(docs)
    n_docs = sum(docs.values())
    log_prior = [math.log(docs[lb] / n_docs) for lb in labels]
    log_oov = [math.log(1.0 / (totals.get(lb, 0) + vocab + 1)) for lb in labels]
    # pivot (label, fid, c) → (fid, llh array): delta over the OOV floor
    exprs = [
        F.log(
            (F.coalesce(F.max(F.when(F.col("_lbl") == lb, F.col("c"))), F.lit(0)) + 1)
            / F.lit(float(totals.get(lb, 0) + vocab + 1))
        )
        - F.lit(log_oov[i])
        for i, lb in enumerate(labels)
    ]
    weights = counts.groupBy("fid").agg(F.array(*exprs).alias("llh"))
    return HashedNaiveBayes(
        weights=weights, labels=labels, log_prior=log_prior, log_oov=log_oov
    )


def naive_bayes_predict(
    df: DataFrame,
    model: HashedNaiveBayes,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id_col, label, log_scores) — argmax over per-class posteriors.

    Each doc's score_i = prior_i + n_features·oov_i + Σ_matched llh_i:
    one model join on the 8-byte fid, one by-doc aggregate (element-wise
    array sum), native argmax. Ties break to the lexicographically first
    label (array_position finds the first maximum). Empty/all-OOV docs
    fall back to the prior argmax.
    """
    k = len(model.labels)
    feats = _feature_rows(df, id_col, text_col)
    joined = feats.join(model.weights, "fid", "left").select("doc", "llh")
    # Per-class streaming sums (r12): sum() skips the OOV rows' null llh
    # (they contribute exactly 0 to the delta) and — unlike the former
    # collect_list + zip_with fold — partially aggregates MAP-SIDE, so
    # the per-doc exchange carries k doubles per (doc, partition)
    # instead of every matched feature's k-array (guide §2.3 "aggregate
    # before you shuffle").
    summed = joined.groupBy("doc").agg(
        F.count("*").alias("n_feats"),
        *[
            F.coalesce(F.sum(F.element_at("llh", i + 1)), F.lit(0.0)).alias(f"__s{i}")
            for i in range(k)
        ],
    )
    scored = summed.select(
        "doc",
        F.array(
            *[
                F.col(f"__s{i}")
                + F.lit(model.log_prior[i])
                + F.lit(model.log_oov[i]) * F.col("n_feats")
                for i in range(k)
            ]
        ).alias("log_scores"),
    )
    labels_arr = F.array(*[F.lit(lb) for lb in model.labels])
    out = scored.select(
        F.col("doc").alias(id_col),
        F.element_at(
            labels_arr, F.array_position(F.col("log_scores"), F.array_max("log_scores")).cast("int")
        ).alias("label"),
        "log_scores",
    )
    # docs with zero features (empty text) never reach the aggregate;
    # re-attach them with the prior-only prediction
    prior_label = model.labels[max(range(k), key=lambda i: model.log_prior[i])]
    missing = df.select(F.col(id_col)).join(out.select(id_col), id_col, "left_anti").select(
        F.col(id_col),
        F.lit(prior_label).alias("label"),
        F.array(*[F.lit(p) for p in model.log_prior]).alias("log_scores"),
    )
    return out.unionByName(missing)
