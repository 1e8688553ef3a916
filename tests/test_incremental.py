"""Incremental MinHash-LSH dedup (operators/incremental): the
incremental result must EXACTLY equal the pairs-involving-the-batch
slice of a full rebuild, the appended index must equal a from-scratch
index, the corpus side must not shuffle (broadcast plan assert), and a
parquet persistence roundtrip must not perturb results."""

import pytest
from pyspark.sql import functions as F

from pixie_spark.operators.dedup import minhash_lsh_pairs
from pixie_spark.operators.incremental import (
    append_to_index,
    build_index,
    incremental_pairs,
)
from pixie_spark.plans import plan_string
from pixie_spark.sources import load_table

N_OLD = 300
THRESH = 0.5


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    """Old batch = first N_OLD docs; new batch = later docs PLUS planted
    near-dups of old docs (one word nudged) and exact internal dups."""
    doc = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    old = doc.where(F.col("doc_id") < N_OLD)
    fresh = doc.where((F.col("doc_id") >= N_OLD) & (F.col("doc_id") < N_OLD + 60))
    planted_old = (
        old.where(F.col("doc_id") < 8)
        .select(
            (F.col("doc_id") + 10_000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" extraword")).alias("text"),
        )
    )
    planted_new = fresh.where(F.col("doc_id") < N_OLD + 4).select(
        (F.col("doc_id") + 20_000).alias("doc_id"), "text"
    )
    new = fresh.unionByName(planted_old).unionByName(planted_new)
    return old.localCheckpoint(), new.localCheckpoint()


def _pairs_set(df):
    return {
        (min(r.doc_a, r.doc_b), max(r.doc_a, r.doc_b), round(r.est_jaccard, 9))
        for r in df.collect()
    }


def test_incremental_equals_full_rebuild_slice(spark, corpus):
    old, new = corpus
    oe, os_ = build_index(old, "doc_id", "text")
    ne, ns = build_index(new, "doc_id", "text")
    got = _pairs_set(incremental_pairs(ne, ns, oe, os_, threshold=THRESH))

    full = minhash_lsh_pairs(
        old.unionByName(new), "doc_id", "text", threshold=THRESH
    )
    new_ids = {r.doc_id for r in new.select("doc_id").collect()}
    expect = {
        p for p in _pairs_set(full) if p[0] in new_ids or p[1] in new_ids
    }
    assert got == expect
    assert got, "fixture must actually contain near-dup pairs"
    # planted cross-batch and within-batch dups are found
    found_ab = {(a, b) for a, b, _ in got}
    assert any(a < N_OLD and b >= 10_000 for a, b in found_ab)  # new-vs-old
    assert any(a >= N_OLD and b >= 20_000 for a, b in found_ab)  # new-vs-new


def test_appended_index_equals_rebuild(spark, corpus):
    old, new = corpus
    oe, os_ = build_index(old, "doc_id", "text")
    ne, ns = build_index(new, "doc_id", "text")
    ae, asig = append_to_index(oe, os_, ne, ns)
    re_, rs = build_index(old.unionByName(new), "doc_id", "text")
    assert {tuple(r) for r in ae.collect()} == {tuple(r) for r in re_.collect()}
    assert {(r.doc, tuple(r.signature)) for r in asig.collect()} == {
        (r.doc, tuple(r.signature)) for r in rs.collect()
    }


def test_corpus_index_is_probe_side_of_broadcast(spark, corpus):
    """The stored index must meet the batch through a broadcast hash
    join (batch side broadcast) — no shuffle of the corpus entries."""
    old, new = corpus
    oe, os_ = build_index(old, "doc_id", "text")
    ne, ns = build_index(new, "doc_id", "text")
    plan = plan_string(incremental_pairs(ne, ns, oe, os_))
    assert "BroadcastHashJoin" in plan, plan


def test_parquet_roundtrip_of_index(spark, corpus, tmp_path):
    old, new = corpus
    oe, os_ = build_index(old, "doc_id", "text")
    oe.write.mode("overwrite").parquet(str(tmp_path / "entries"))
    os_.write.mode("overwrite").parquet(str(tmp_path / "sigs"))
    oe2 = spark.read.parquet(str(tmp_path / "entries"))
    os2 = spark.read.parquet(str(tmp_path / "sigs"))
    ne, ns = build_index(new, "doc_id", "text")
    direct = _pairs_set(incremental_pairs(ne, ns, oe, os_))
    via_disk = _pairs_set(incremental_pairs(ne, ns, oe2, os2))
    assert direct == via_disk
