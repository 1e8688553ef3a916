"""DSIR importance resampling (operators/sampling.py): score math vs a
Python recompute, target-likeness selection, determinism."""

from __future__ import annotations

import math

from pixie_spark.operators import sampling as S

EN = [
    "the cat sat on the mat and the dog slept by the door",
    "the quick brown fox jumps over the lazy dog in the yard",
    "she walked to the market and bought some fresh bread today",
    "the children played in the park until the sun went down",
    "he opened the book and read the first chapter slowly",
]
JUNK = [
    "zzq vvk qqj xxp wwm kkz ppv jjq",
    "0x1f 0x2e 0x3d 0x4c 0x5b 0x6a deadbeef cafebabe",
    "lorem42 ipsum99 dolor13 sit77 amet55 foo11 bar22",
    "aaa bbb ccc ddd eee fff ggg hhh",
    "qwerty asdfgh zxcvbn uiop hjkl vbnm",
]


def _mk(spark, texts, start=0):
    return spark.createDataFrame(
        [(start + i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_bucket_distribution_is_normalized(spark):
    df = _mk(spark, EN)
    p = S.bucket_distribution(df, n_buckets=512)
    assert len(p) == 512
    assert math.isclose(sum(p), 1.0, rel_tol=1e-9)
    assert all(v > 0 for v in p)  # smoothing keeps log finite


def test_importance_scores_match_python_recompute(spark):
    df = _mk(spark, EN + JUNK)
    B = 256
    lr = [math.sin(b) for b in range(B)]  # arbitrary fixed ratios
    got = {
        r["doc"]: r["score"]
        for r in S.importance_scores(df, lr, n_buckets=B).collect()
    }
    rows = S._gram_buckets(df, "doc_id", "text", n=2, n_buckets=B).collect()
    exp: dict[int, float] = {i: 0.0 for i in range(len(EN) + len(JUNK))}
    for r in rows:
        exp[r["doc"]] += lr[int(r["bucket"])]
    assert set(got) == set(exp)
    for d in exp:
        assert math.isclose(got[d], exp[d], rel_tol=1e-9, abs_tol=1e-9), d


def test_greedy_selection_prefers_target_like_docs(spark):
    target = _mk(spark, EN)
    raw = _mk(spark, EN + JUNK)  # docs 0-4 english, 5-9 junk
    kept = S.dsir_resample(raw, target, k=5, n_buckets=1024, gumbel=False)
    ids = sorted(r["doc_id"] for r in kept.collect())
    assert ids == [0, 1, 2, 3, 4], ids


def test_gumbel_resample_deterministic_and_bounded(spark):
    target = _mk(spark, EN)
    raw = _mk(spark, EN + JUNK)
    a = sorted(r["doc_id"] for r in S.dsir_resample(raw, target, k=6, seed=7).collect())
    b = sorted(r["doc_id"] for r in S.dsir_resample(raw, target, k=6, seed=7).collect())
    assert a == b and len(a) == 6
    # output rows keep the raw schema plus the score column
    out = S.dsir_resample(raw, target, k=3, seed=7)
    assert set(out.columns) == {"doc_id", "text", "score"}


def test_edge_cases_empty_inputs(spark):
    """Empty target -> smoothing-only uniform distribution (no crash);
    empty raw -> empty selection."""
    empty = spark.createDataFrame([], "doc_id long, text string")
    docs = _mk(spark, ["a b c d e f g h i j k l"])
    assert S.dsir_resample(docs, empty, k=1, n_buckets=64).count() == 1
    assert S.dsir_resample(empty, docs, k=1, n_buckets=64).count() == 0
