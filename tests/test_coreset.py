"""Lightweight coreset (Bachem et al. 2018; ref kernel
src/carnot/exec/ml/coreset.cc): q-distribution math against a Python
reference, cost preservation, determinism, and degenerate inputs."""

import math

import numpy as np
import pytest

from pixie_spark.functions.ml_ops import kmeans_cost, kmeans_fit, lightweight_coreset


def _mkdf(spark, vecs):
    rows = [(i, [float(v) for v in vec]) for i, vec in enumerate(vecs)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _q_reference(vecs):
    """The paper's sampling distribution, computed in plain Python."""
    x = np.asarray(vecs, dtype=np.float64)
    mu = x.mean(axis=0)
    d2 = ((x - mu) ** 2).sum(axis=1)
    return 0.5 / len(x) + 0.5 * d2 / d2.sum()


def test_q_matches_python_reference(spark):
    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(40, 5))
    df = _mkdf(spark, vecs)
    core = lightweight_coreset(df, m=40, vec_col="embedding", id_col="vec_id").collect()
    ref = _q_reference(vecs)
    assert len(core) == 40  # m >= n keeps everything
    for r in core:
        assert r["q"] == pytest.approx(ref[r["vec_id"]], rel=1e-12)
        assert r["weight"] == pytest.approx(1.0 / (40 * ref[r["vec_id"]]), rel=1e-12)


def test_weight_mass_approximates_n(spark):
    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(400, 8))
    df = _mkdf(spark, vecs)
    core = lightweight_coreset(df, m=120, vec_col="embedding", id_col="vec_id").collect()
    assert len(core) == 120
    mass = sum(r["weight"] for r in core)
    # E[sum 1/(m q)] = n under iid draws; Gumbel-top-m without
    # replacement keeps it close
    assert mass == pytest.approx(400, rel=0.35)


def test_cost_preservation_on_clustered_data(spark):
    """The contract: weighted k-means cost on the coreset tracks the full
    cost for the same centers (here: centers fit on the full data)."""
    rng = np.random.default_rng(11)
    centers = rng.normal(scale=8.0, size=(4, 6))
    vecs = np.concatenate(
        [c + rng.normal(scale=0.6, size=(150, 6)) for c in centers]
    )
    df = _mkdf(spark, vecs).localCheckpoint()
    centroids = kmeans_fit(df, "embedding", k=4, max_iter=5, dim=6)
    full = kmeans_cost(df, centroids, "embedding")
    core = lightweight_coreset(df, m=150, vec_col="embedding", id_col="vec_id")
    approx = kmeans_cost(core, centroids, "embedding", weight_col="weight")
    assert approx == pytest.approx(full, rel=0.35)
    assert full > 0


def test_coreset_centroids_transfer_to_full_data(spark):
    """Fitting on the coreset must give near-optimal cost on the FULL
    data — the end-to-end use the reference's kmeans UDA makes of its
    coreset (bounded state, full-data-quality clusters)."""
    rng = np.random.default_rng(5)
    centers = rng.normal(scale=10.0, size=(3, 4))
    vecs = np.concatenate([c + rng.normal(scale=0.5, size=(200, 4)) for c in centers])
    df = _mkdf(spark, vecs).localCheckpoint()
    full_centroids = kmeans_fit(df, "embedding", k=3, max_iter=5, dim=4)
    full_cost = kmeans_cost(df, full_centroids, "embedding")
    core = lightweight_coreset(df, m=90, vec_col="embedding", id_col="vec_id").localCheckpoint()
    core_centroids = kmeans_fit(core, "embedding", k=3, max_iter=5, dim=4, weight_col="weight")
    transfer_cost = kmeans_cost(df, core_centroids, "embedding")
    # well-separated clusters: coreset-trained centers must land in the
    # same basins, so the cost ratio stays near 1
    assert transfer_cost <= 1.5 * full_cost


def test_deterministic_selection(spark):
    rng = np.random.default_rng(2)
    vecs = rng.normal(size=(100, 4))
    df = _mkdf(spark, vecs)
    a = lightweight_coreset(df, m=25, vec_col="embedding", id_col="vec_id", seed=9)
    b = lightweight_coreset(df, m=25, vec_col="embedding", id_col="vec_id", seed=9)
    ids_a = sorted(r["vec_id"] for r in a.collect())
    ids_b = sorted(r["vec_id"] for r in b.collect())
    assert ids_a == ids_b
    c = lightweight_coreset(df, m=25, vec_col="embedding", id_col="vec_id", seed=10)
    assert sorted(r["vec_id"] for r in c.collect()) != ids_a


def test_identical_points_fall_back_to_uniform(spark):
    df = _mkdf(spark, [[1.0, 2.0]] * 30)
    core = lightweight_coreset(df, m=10, vec_col="embedding", id_col="vec_id").collect()
    assert len(core) == 10
    for r in core:
        assert r["q"] == pytest.approx(1.0 / 30)
        assert r["weight"] == pytest.approx(3.0)


def test_empty_input(spark):
    df = spark.createDataFrame([], "vec_id long, embedding array<double>")
    core = lightweight_coreset(df, m=5, vec_col="embedding", id_col="vec_id")
    assert core.count() == 0


def test_selection_plan_is_take_ordered(spark):
    """The m-row selection must be TakeOrderedAndProject (per-partition
    heaps), never a global sort of the corpus."""
    rng = np.random.default_rng(1)
    df = _mkdf(spark, rng.normal(size=(50, 3)))
    core = lightweight_coreset(df, m=5, vec_col="embedding", id_col="vec_id")
    plan = core._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
