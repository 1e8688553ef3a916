"""Snapshot diff (operators/diff): verdicts vs a plain-Python dict
reference on a perturbed copy of the documents table, default
compare-column inference, duplicate-key collapse, and the 16-bytes-per-
row shuffle contract (hash projection before the join)."""

import pytest
from pyspark.sql import functions as F

from pixie_spark.operators.diff import diff_summary, snapshot_diff
from pixie_spark.plans import plan_string
from pixie_spark.sources import load_table


@pytest.fixture(scope="module")
def versions(spark, sf_dir):
    doc = load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    old = doc.where(F.col("doc_id") < 400)
    new = (
        doc.where((F.col("doc_id") >= 50) & (F.col("doc_id") < 450))  # 0-49 removed, 400-449 added
        .withColumn(
            "text",
            F.when(F.col("doc_id") % 7 == 0, F.concat("text", F.lit(" EDIT"))).otherwise(
                F.col("text")
            ),
        )
    )
    return old.localCheckpoint(), new.localCheckpoint()


def _py_diff(old_rows, new_rows):
    o = {r.doc_id: (r.text, r.lang) for r in old_rows}
    n = {r.doc_id: (r.text, r.lang) for r in new_rows}
    out = {}
    for k in o.keys() | n.keys():
        if k not in o:
            out[k] = "added"
        elif k not in n:
            out[k] = "removed"
        elif o[k] != n[k]:
            out[k] = "changed"
        else:
            out[k] = "unchanged"
    return out


def test_diff_matches_python_reference(spark, versions):
    old, new = versions
    expect = _py_diff(old.collect(), new.collect())
    got = {
        r.doc_id: r.status
        for r in snapshot_diff(old, new, ["doc_id"], include_unchanged=True).collect()
    }
    assert got == expect
    # and the non-trivial statuses all actually occur in the fixture
    assert {"added", "removed", "changed", "unchanged"} <= set(got.values())


def test_summary_counts(spark, versions):
    old, new = versions
    expect = _py_diff(old.collect(), new.collect())
    got = {
        r.status: r.n
        for r in diff_summary(
            snapshot_diff(old, new, ["doc_id"], include_unchanged=True)
        ).collect()
    }
    from collections import Counter

    assert got == dict(Counter(expect.values()))


def test_default_excludes_unchanged(spark, versions):
    old, new = versions
    out = snapshot_diff(old, new, ["doc_id"])
    assert {r.status for r in out.collect()} == {"added", "removed", "changed"}


def test_duplicate_keys_collapse(spark):
    old = spark.createDataFrame([(1, "a"), (1, "a"), (2, "b")], ["k", "v"])
    new = spark.createDataFrame([(1, "a"), (2, "c")], ["k", "v"])
    got = {r.k: r.status for r in snapshot_diff(old, new, ["k"]).collect()}
    assert got == {2: "changed"}


def test_no_compare_cols_raises(spark):
    df = spark.createDataFrame([(1,)], ["k"])
    with pytest.raises(ValueError, match="no comparable columns"):
        snapshot_diff(df, df, ["k"])


def test_join_carries_hashes_not_rows(spark, versions):
    """The shuffle payload is (key, hash): the SMJ/shuffle inputs project
    to two columns per side — text/lang must not appear in the join."""
    old, new = versions
    plan = plan_string(snapshot_diff(old, new, ["doc_id"]))
    join_on = [line for line in plan.splitlines() if "SortMergeJoin" in line or "ShuffledHashJoin" in line]
    assert join_on, plan
    assert "text" not in " ".join(join_on), join_on
