"""Vocabulary / BPE-pair statistics (operators/text.py) vs Python
references."""

from __future__ import annotations

import re
from collections import Counter

from pixie_spark.operators.text import bpe_pair_stats, vocab_stats
from pixie_spark.sources import load_table

DOCS = [
    (0, "the cat sat on the mat"),
    (1, "The Cat ate the hat"),
    (2, "low lower lowest low"),
    (3, "a"),
    (4, "  "),
]


def _words(t):
    return [w for w in re.split(r"\s+", t) if w]


def test_vocab_stats_match_python(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {r["term"]: (r["count"], r["doc_freq"]) for r in vocab_stats(df).collect()}
    cnt, dfreq = Counter(), Counter()
    for d, t in DOCS:
        ws = [w.lower() for w in _words(t)]
        cnt.update(ws)
        dfreq.update(set(ws))
    assert got == {w: (c, dfreq[w]) for w, c in cnt.items()}


def test_vocab_top_k_order(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    top = vocab_stats(df, top_k=2).collect()
    # the=4; cat/low tie at 2 -> term-asc tiebreak picks cat
    assert [r["term"] for r in top] == ["the", "cat"]
    assert [r["count"] for r in top] == [4, 2]


def test_bpe_pairs_match_python(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {(r["left"], r["right"]): r["count"] for r in bpe_pair_stats(df).collect()}
    cnt = Counter()
    for d, t in DOCS:
        cnt.update(w.lower() for w in _words(t))
    exp = Counter()
    for w, c in cnt.items():
        for a, b in zip(w, w[1:]):
            exp[(a, b)] += c
    assert got == dict(exp)
    # sanity: 'lo' pair comes from low(2) + lower(1) + lowest(1) = 4
    assert got[("l", "o")] == 4


def test_vocab_on_fixture(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    top = vocab_stats(docs, top_k=20).collect()
    assert len(top) == 20
    assert all(top[i]["count"] >= top[i + 1]["count"] for i in range(19))
