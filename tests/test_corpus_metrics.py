"""Corpus diversity (distinct-n) and tokenizer fertility metrics
(operators/text.py) vs Python references."""

import pytest
import pyspark.sql.functions as F

from pixie_spark.operators.text import bpe_fertility, bpe_train, distinct_ngram_stats

ROWS = [
    (1, "the cat sat on the mat", "en"),
    (2, "the cat sat on the hat", "en"),
    (3, "spam spam spam spam spam spam", "en"),
    (4, "uno dos tres cuatro cinco", "es"),
]


def _df(spark):
    return spark.createDataFrame(ROWS, "doc_id long, text string, lang string")


def _py_ngrams(texts, n):
    total, distinct = 0, set()
    for t in texts:
        ws = t.split()
        for i in range(len(ws) - n + 1):
            total += 1
            distinct.add(tuple(ws[i : i + n]))
    return total, len(distinct)


def test_distinct_ngram_stats_matches_python(spark):
    out = {r["n"]: r for r in distinct_ngram_stats(_df(spark), (1, 2, 3)).collect()}
    texts = [t for _, t, _ in ROWS]
    for n in (1, 2, 3):
        total, distinct = _py_ngrams(texts, n)
        assert out[n]["total_ngrams"] == total
        # HLL at 0.5% target rsd: exact at these cardinalities up to ±2%
        assert out[n]["distinct_ngrams"] == pytest.approx(distinct, rel=0.02)
        assert out[n]["distinct_ratio"] == pytest.approx(distinct / total, rel=0.02)


def test_distinct_ngram_repetitive_slice_scores_low(spark):
    by = {
        (r["lang"], r["n"]): r["distinct_ratio"]
        for r in distinct_ngram_stats(_df(spark), (2,), slice_col="lang").collect()
    }
    # the es slice is all-unique bigrams; the en slice contains the spam doc
    assert by[("es", 2)] == pytest.approx(1.0, rel=0.02)
    assert by[("en", 2)] < 0.8


def test_bpe_fertility_matches_python(spark):
    from pixie_spark.operators.text import bpe_encode_word

    df = _df(spark)
    merges = bpe_train(df, num_merges=20)
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    out = {r["lang"]: r for r in bpe_fertility(df, merges, slice_col="lang").collect()}
    for lang in ("en", "es"):
        texts = [t for _, t, l in ROWS if l == lang]
        words = [w for t in texts for w in t.lower().split()]
        toks = sum(len(bpe_encode_word(w, ranks)) for w in words)
        assert out[lang]["total_words"] == len(words)
        assert out[lang]["total_tokens"] == toks
        assert out[lang]["fertility"] == pytest.approx(toks / len(words), rel=1e-9)
    # the untrained-script slice fragments more than the trained one
    assert out["es"]["fertility"] >= out["en"]["fertility"]
