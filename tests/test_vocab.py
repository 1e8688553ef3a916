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


# ---------------------------------------------------------------------------
# BPE training / encoding
# ---------------------------------------------------------------------------


def _py_bpe_train(word_counts, num_merges):
    """Direct reference implementation of the same algorithm."""
    vocab = {tuple(w): c for w, c in word_counts.items()}
    merges = []
    for _ in range(num_merges):
        pairs = Counter()
        for w, c in vocab.items():
            for p in zip(w, w[1:]):
                pairs[p] += c
        if not pairs:
            break
        best = min(pairs, key=lambda p: (-pairs[p], p))
        if pairs[best] < 2:
            break
        merges.append(best)
        a, b = best
        nv = Counter()
        for w, c in vocab.items():
            out, i = [], 0
            while i < len(w):
                if i + 1 < len(w) and w[i] == a and w[i + 1] == b:
                    out.append(a + b); i += 2
                else:
                    out.append(w[i]); i += 1
            nv[tuple(out)] += c
        vocab = dict(nv)
    return merges


def test_bpe_train_matches_reference(spark):
    from pixie_spark.operators.text import bpe_train

    texts = (["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = bpe_train(df, num_merges=6)
    counts = Counter(texts)
    exp = _py_bpe_train(dict(counts), 6)
    assert got == exp
    # the classic Sennrich example: ('e','s') is the first merge (count 9)
    assert got[0] == ("e", "s")
    assert got[1] == ("es", "t")


def test_bpe_encode_round_trip(spark):
    from pixie_spark.operators.text import bpe_encode, bpe_train

    texts = ["low lower lowest", "newest widest low", "the lowest newest"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges = bpe_train(df, num_merges=10)
    out = {r["doc_id"]: r["bpe_tokens"] for r in bpe_encode(df, merges).collect()}
    for i, t in enumerate(texts):
        toks = out[i]
        # concatenating tokens reconstructs the words exactly
        assert "".join(toks) == t.lower().replace(" ", "")
        # trained merges actually compress: fewer tokens than chars
        assert len(toks) < sum(len(w) for w in t.split())


def test_bpe_encode_handles_unseen_and_empty(spark):
    from pixie_spark.operators.text import bpe_encode, bpe_train

    train = spark.createDataFrame([(0, "aa aa aa ab")], "doc_id long, text string")
    merges = bpe_train(train, num_merges=3)
    df = spark.createDataFrame(
        [(0, "aa zz"), (1, ""), (2, None)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["bpe_tokens"] for r in bpe_encode(df, merges).collect()}
    assert got[0][0] == "aa"          # trained merge applies
    assert got[0][1:] == ["z", "z"]   # unseen word falls back to chars
    assert got[1] == [] and got[2] == []
