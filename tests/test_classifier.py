"""Hashed multinomial Naive Bayes (operators/classifier.py) vs a pure
Python Counter reference — exact log-score equality — plus holdout
accuracy, empty-doc fallback, and min_count pruning."""

import math
from collections import Counter

import pytest
from pytest import approx
from pyspark.sql import functions as F

from pixie_spark.operators.classifier import naive_bayes_predict, naive_bayes_train

TRAIN = [
    (1, "spam", "win money now click free prize money claim now"),
    (2, "spam", "free prize click here win win lottery money"),
    (3, "spam", "claim your free money prize now click"),
    (4, "ham", "meeting notes attached see agenda for tomorrow"),
    (5, "ham", "lunch tomorrow after the meeting sounds good"),
    (6, "ham", "please review the attached report before the meeting"),
]

SCORE = [
    (10, "free money click now"),
    (11, "see you at the meeting tomorrow"),
    (12, "prize meeting"),          # mixed evidence
    (13, ""),                       # empty → prior fallback
    (14, "zzz qqq www"),            # all-OOV → prior + oov mass
]


def _features(text):
    ws = text.lower().split()
    return ws + [f"{a} {b}" for a, b in zip(ws, ws[1:])]


def py_reference(train, score, min_count=1):
    """Independent NB with add-one smoothing over unigram+bigram
    features, mirroring the documented scoring contract."""
    by_label = {}
    docs = Counter()
    for _, lbl, t in train:
        docs[lbl] += 1
        by_label.setdefault(lbl, Counter()).update(_features(t))
    if min_count > 1:
        total = Counter()
        for c in by_label.values():
            total.update(c)
        for lbl in by_label:
            by_label[lbl] = Counter(
                {f: c for f, c in by_label[lbl].items() if total[f] >= min_count}
            )
    vocab = set()
    for c in by_label.values():
        vocab |= set(c)
    labels = sorted(docs)
    n_docs = sum(docs.values())
    out = {}
    for did, t in score:
        feats = _features(t)
        scores = []
        for lbl in labels:
            tot = sum(by_label[lbl].values())
            s = math.log(docs[lbl] / n_docs)
            for f in feats:
                s += math.log((by_label[lbl].get(f, 0) + 1) / (tot + len(vocab) + 1))
            scores.append(s)
        best = max(range(len(labels)), key=lambda i: (scores[i], -i))
        out[did] = (labels[best], scores)
    return out


@pytest.fixture(scope="module")
def model_and_preds(spark):
    train = spark.createDataFrame(TRAIN, ["doc_id", "label", "text"])
    score = spark.createDataFrame(SCORE, ["doc_id", "text"])
    model = naive_bayes_train(train, "label")
    preds = {r["doc_id"]: (r["label"], list(r["log_scores"]))
             for r in naive_bayes_predict(score, model).collect()}
    return model, preds


def test_model_shape(spark, model_and_preds):
    model, _ = model_and_preds
    assert model.labels == ["ham", "spam"]
    assert len(model.log_prior) == 2 and len(model.log_oov) == 2
    # priors: 3 docs each
    assert model.log_prior[0] == approx(math.log(0.5), rel=1e-12)


def test_scores_match_python_reference(spark, model_and_preds):
    _, preds = model_and_preds
    ref = py_reference(TRAIN, SCORE)
    assert set(preds) == set(ref)
    for did, (lbl, scores) in ref.items():
        glbl, gscores = preds[did]
        if did != 13:  # empty doc: spark emits prior-only scores (below)
            assert gscores == approx(scores, rel=1e-12), did
        assert glbl == lbl, did


def test_classifies_held_out(spark, model_and_preds):
    _, preds = model_and_preds
    assert preds[10][0] == "spam"
    assert preds[11][0] == "ham"


def test_empty_doc_prior_fallback(spark, model_and_preds):
    model, preds = model_and_preds
    lbl, scores = preds[13]
    # equal priors tie → first label by order
    assert lbl == model.labels[0]
    assert scores == approx(model.log_prior, rel=1e-12)


def test_all_oov_doc(spark, model_and_preds):
    """All-OOV text: every feature contributes exactly the per-class OOV
    floor — the score is prior + n_feats·oov, still a valid posterior."""
    model, preds = model_and_preds
    lbl, scores = preds[14]
    n_feats = len(_features("zzz qqq www"))
    want = [p + n_feats * o for p, o in zip(model.log_prior, model.log_oov)]
    assert scores == approx(want, rel=1e-12)


def test_min_count_pruning(spark):
    train = spark.createDataFrame(TRAIN, ["doc_id", "label", "text"])
    m1 = naive_bayes_train(train, "label", min_count=1)
    m2 = naive_bayes_train(train, "label", min_count=2)
    assert m2.weights.count() < m1.weights.count()
    # pruned model still classifies the clear cases
    score = spark.createDataFrame(SCORE[:2], ["doc_id", "text"])
    preds = {r["doc_id"]: r["label"] for r in naive_bayes_predict(score, m2).collect()}
    assert preds == {10: "spam", 11: "ham"}
