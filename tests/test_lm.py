"""Bigram stupid-backoff LM perplexity (operators/lm.py) vs a pure-Python
reference implementation (Counters + math.log) — exact score equality,
plus the CCNet-filter semantics (fluent docs score below gibberish)."""

import math
from collections import Counter

import pytest
from pytest import approx
from pyspark.sql import functions as F

from pixie_spark.operators.lm import (
    BACKOFF_ALPHA,
    lm_score,
    ngram_lm_train,
    perplexity_filter,
)

TRAIN = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick red fox runs over the lazy cat"),
    (3, "a lazy dog sleeps all day under the tree"),
    (4, "The Quick Brown Dog Jumps Over The Fence"),  # case-folds into mass
    (5, "every quick fox loves the lazy dog"),
]

SCORE = [
    (10, "the quick brown fox"),          # in-distribution: low ppl
    (11, "the lazy dog sleeps"),          # in-distribution
    (12, "zxq vvw qqq plorth"),           # pure OOV gibberish: high ppl
    (13, "fox the over quick lazy"),      # known words, unseen order
    (14, ""),                             # empty: no rows
    (15, "the"),                          # single token: unigram only
]


def py_reference(train_texts, score_texts, min_count=1):
    """Independent reimplementation of the scoring contract."""
    uni, bi = Counter(), Counter()
    for t in train_texts:
        ws = t.lower().split()
        uni.update(ws)
        bi.update(zip(ws, ws[1:]))
    n, v = sum(uni.values()), len(uni)
    log_oov = math.log(1.0 / (n + v + 1))

    def p_uni(w):
        return math.log((uni[w] + 1) / (n + v + 1)) if w in uni else log_oov

    out = {}
    for i, t in enumerate(score_texts):
        ws = t.lower().split()
        if not ws:
            continue
        lps = [p_uni(ws[0])]
        for w1, w2 in zip(ws, ws[1:]):
            if bi[(w1, w2)] >= max(1, min_count) and (w1, w2) in bi:
                lps.append(math.log(bi[(w1, w2)] / uni[w1]))
            else:
                lps.append(math.log(BACKOFF_ALPHA) + p_uni(w2))
        out[i] = (len(lps), sum(lps), math.exp(-sum(lps) / len(lps)))
    return out


@pytest.fixture(scope="module")
def lm_and_scores(spark):
    train = spark.createDataFrame(TRAIN, ["doc_id", "text"])
    score = spark.createDataFrame(SCORE, ["doc_id", "text"])
    lm = ngram_lm_train(train)
    got = {r["doc_id"]: (r["n_tokens"], r["log_prob"], r["perplexity"])
           for r in lm_score(score, lm).collect()}
    return lm, got


def test_model_scalars(spark, lm_and_scores):
    lm, _ = lm_and_scores
    words = [w for _, t in TRAIN for w in t.lower().split()]
    assert lm.total_tokens == len(words)
    assert lm.vocab_size == len(set(words))


def test_scores_match_python_reference(spark, lm_and_scores):
    _, got = lm_and_scores
    ref = py_reference([t for _, t in TRAIN], [t for _, t in SCORE])
    # reference is keyed by list index; spark by doc_id (10 + index)
    assert set(got) == {10 + i for i in ref}
    for i, (n, lp, ppl) in ref.items():
        gn, glp, gppl = got[10 + i]
        assert gn == n
        assert glp == approx(lp, rel=1e-12)
        assert gppl == approx(ppl, rel=1e-12)


def test_empty_doc_scores_no_row(spark, lm_and_scores):
    _, got = lm_and_scores
    assert 14 not in got


def test_fluent_below_gibberish(spark, lm_and_scores):
    """The CCNet premise on this tiny model: in-distribution text scores
    far lower perplexity than OOV gibberish, and lower than scrambled
    word salad of in-vocabulary words."""
    _, got = lm_and_scores
    fluent, salad, gibberish = got[10][2], got[13][2], got[12][2]
    assert fluent < salad < gibberish
    assert gibberish / fluent > 20


def test_perplexity_filter_keeps_head(spark):
    train = spark.createDataFrame(TRAIN, ["doc_id", "text"])
    score = spark.createDataFrame([r for r in SCORE if r[1]], ["doc_id", "text"])
    lm = ngram_lm_train(train)
    ppls = {r["doc_id"]: r["perplexity"] for r in lm_score(score, lm).collect()}
    cut = sorted(ppls.values())[len(ppls) // 2]  # keep the low-ppl half
    kept = perplexity_filter(score, lm, cut)
    kept_ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    assert kept_ids == {d for d, p in ppls.items() if p <= cut}
    assert "text" in kept.columns and "perplexity" in kept.columns


def test_min_count_prunes_bigrams(spark):
    """min_count=2 drops hapax bigrams: every surviving bigram occurred
    at least twice in training; scores then back off more often (ppl for
    a once-seen continuation rises)."""
    train = spark.createDataFrame(TRAIN, ["doc_id", "text"])
    lm1 = ngram_lm_train(train, min_count=1)
    lm2 = ngram_lm_train(train, min_count=2)
    assert lm2.bigrams.count() < lm1.bigrams.count()
    # 'brown fox' occurs once in training → pruned at min_count=2
    probe = spark.createDataFrame([(1, "brown fox")], ["doc_id", "text"])
    p1 = lm_score(probe, lm1).first()["perplexity"]
    p2 = lm_score(probe, lm2).first()["perplexity"]
    assert p2 > p1


def test_perplexity_buckets_thirds(spark):
    """head/middle/tail split: each bucket holds ~a third, ordered by
    fluency (every head doc scores below every tail doc)."""
    from pixie_spark.operators.lm import perplexity_buckets

    train = spark.createDataFrame(TRAIN, "doc_id long, text string")
    lm = ngram_lm_train(train, min_count=1)
    docs = [(i, "the quick brown fox " + "zx " * (i % 7)) for i in range(60)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = perplexity_buckets(df, lm).collect()
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r["bucket"], []).append(r["perplexity"])
    assert set(by_bucket) == {"head", "middle", "tail"}
    assert max(by_bucket["head"]) <= min(by_bucket["middle"])
    assert max(by_bucket["middle"]) <= min(by_bucket["tail"])
    # roughly balanced thirds (ties at the cut can shift a few docs)
    for b in by_bucket.values():
        assert 10 <= len(b) <= 30


def test_perplexity_buckets_per_group(spark):
    """CCNet buckets per language: cuts computed within each group, so a
    group whose scores are uniformly high still gets its own head."""
    from pixie_spark.operators.lm import perplexity_buckets

    train = spark.createDataFrame(TRAIN, "doc_id long, text string")
    lm = ngram_lm_train(train, min_count=1)
    rows = [(i, "the quick brown fox", "en") for i in range(10)]
    rows += [(100 + i, "zxq vvw qqq plorth " + "zz " * (i % 5), "xx") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = perplexity_buckets(df, lm, group_col="lang").collect()
    langs = {}
    for r in out:
        langs.setdefault(r["lang"], set()).add(r["bucket"])
    # the gibberish group still has a head bucket OF ITS OWN
    assert "head" in langs["xx"]
    assert "head" in langs["en"]


def test_perplexity_buckets_exact_cuts_agree_with_sketch(spark):
    """The oracle-parity mode (exact percentile + rounding) and the
    production sketch path must assign the same buckets except possibly
    at the cut boundaries — on a corpus with distinct perplexities the
    disagreement set is tiny."""
    from pixie_spark.operators.lm import ngram_lm_train, perplexity_buckets
    from pixie_spark.sources import load_table

    doc = load_table(spark, "/root/testdata/sf0.001", "documents")
    lm = ngram_lm_train(doc, min_count=2)
    exact = {
        r["doc_id"]: r["bucket"]
        for r in perplexity_buckets(
            doc, lm, group_col="lang", exact_cuts=True, round_to=6
        ).collect()
    }
    sketch = {
        r["doc_id"]: r["bucket"]
        for r in perplexity_buckets(doc, lm, group_col="lang").collect()
    }
    assert set(exact) == set(sketch)
    diff = [d for d in exact if exact[d] != sketch[d]]
    assert len(diff) <= max(2, len(exact) // 50), diff  # boundary-only drift
    # and each (lang) group really splits into three ordered buckets
    assert set(exact.values()) == {"head", "middle", "tail"}
