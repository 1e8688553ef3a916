"""End-to-end corpus-cleaning pipeline (operators/pipeline.py): each
stage removes exactly its planted offenders; the funnel is monotone."""

from __future__ import annotations

import random

import pytest

from pixie_spark.operators import pipeline as P
from pixie_spark.sources import load_table

random.seed(13)
VOCAB = [f"w{i}" for i in range(400)]


def _doc(n=30):
    return " ".join(random.choice(VOCAB) for _ in range(n))


BOILER = " ".join(f"b{i}" for i in range(12))  # 12-word shared span

BASE = [_doc() for _ in range(6)]
NEAR_SRC = _doc(40)
DOCS = [
    (0, BASE[0]),
    (1, BASE[1]),
    (2, "one two"),                      # fails word_count (min 5)
    (3, BASE[2]),
    (4, BASE[2]),                        # exact duplicate of 3
    (5, NEAR_SRC),
    (6, NEAR_SRC + " tail one two"),     # near-dup of 5 (J >= 0.5)
    (7, BASE[3] + " " + BOILER),         # span owner (min id wins)
    (8, BASE[4] + " " + BOILER),         # loses the boilerplate span
    (9, BASE[5]),
]


@pytest.fixture(scope="module")
def stages(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    return P.clean_corpus(
        df, quality_rules=P.STRUCTURAL_RULES, min_words=5, shingle_n=5,
        near_dup_threshold=0.5, span_k=10,
    )


def test_quality_stage_drops_short_doc(spark, stages):
    kept = {r["doc_id"] for r in stages["after_quality"].collect()}
    assert kept == set(range(10)) - {2}


def test_exact_stage_keeps_min_id_of_duplicate_pair(spark, stages):
    kept = {r["doc_id"] for r in stages["after_exact"].collect()}
    assert 3 in kept and 4 not in kept
    assert kept == set(range(10)) - {2, 4}


def test_near_dup_stage_collapses_cluster(spark, stages):
    pairs = {(r["doc_a"], r["doc_b"]) for r in stages["near_pairs"].collect()}
    assert (5, 6) in pairs
    kept = {r["doc_id"] for r in stages["after_near"].collect()}
    assert 5 in kept and 6 not in kept


def test_span_stage_strips_boilerplate_from_non_owner(spark, stages):
    clean = {r["doc"]: r for r in stages["clean"].collect()}
    # monotone funnel: span stage preserves doc count
    assert set(clean) == {r["doc_id"] for r in stages["after_near"].collect()}
    # doc 7 (min id) owns the boilerplate and keeps it; doc 8 loses it
    assert clean[7]["n_removed"] == 0
    assert clean[8]["n_removed"] >= 12
    assert "b0" in clean[7]["text"] and "b11" in clean[7]["text"]
    assert "b0" not in clean[8]["text"] and "b11" not in clean[8]["text"]
    # untouched docs keep their exact word multiset
    assert clean[0]["n_removed"] == 0
    assert sorted(clean[0]["text"].split()) == sorted(DOCS[0][1].split())


def test_report_funnel_on_fixture_corpus(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(120)
    rep = P.clean_corpus_report(
        docs, quality_rules=P.STRUCTURAL_RULES, min_words=5
    ).collect()[0]
    assert rep["n_input"] == 120
    assert (
        rep["n_input"] >= rep["n_after_quality"] >= rep["n_after_exact"]
        >= rep["n_after_near"] == rep["n_clean"]
    )
    assert rep["words_removed_by_span_dedup"] >= 0
