"""bench.py record machinery — the parts committed BENCH_*.json files
are built from (round-11): the io cache-state probe and the
vs_baseline cross-round self-adjudication block. Pure-python tests; no
Spark session."""

import bench


def _cal(codegen=1.0, shuffle=2.0, io=None):
    out = {
        "codegen": {"median": codegen},
        "shuffle": {"median": shuffle},
    }
    if io is not None:
        out["io"] = {"median": io}
    return out


CFG = {"shuffle_partitions": "32", "aqe": "true",
       "materialize": "localCheckpoint", "headline_only": False}


def _base(sf=0.1, config=CFG, codegen=1.0, shuffle=2.0, io=None, queries=None):
    return {
        "sf": sf,
        "config": dict(config) if config else config,
        "calibration": {"before": _cal(codegen, shuffle, io)},
        "queries": dict(queries or {}),
        "extra_queries": {},
    }


def test_vs_baseline_config_mismatch_refuses_with_reason():
    base = _base(config=dict(CFG, shuffle_partitions="2000"))
    vb = bench.baseline_comparison(base, 0.1, CFG, _cal(), {"q": 1.0})
    assert "skipped" in vb
    assert any("shuffle_partitions" in m for m in vb["mismatch"])


def test_vs_baseline_sf_mismatch_refuses():
    vb = bench.baseline_comparison(_base(sf=1.0), 0.1, CFG, _cal(), {})
    assert "skipped" in vb and any(m.startswith("sf:") for m in vb["mismatch"])


def test_vs_baseline_unstamped_baseline_compares_with_annotation():
    base = _base(config=None, queries={"q": 1.0})
    vb = bench.baseline_comparison(base, 0.1, CFG, _cal(), {"q": 1.0})
    assert vb["baseline_config_unstamped"] is True
    assert "skipped" not in vb


def test_within_box_drift_uses_compute_envelope():
    # probes ran 1.5x the baseline's -> envelope 1.725; a 1.6x query
    # step is machine drift, a 2.0x step is NOT absorbed
    base = _base(queries={"drifted": 1.0, "regressed": 1.0, "flat": 1.0})
    cur = _cal(codegen=1.5, shuffle=2.0 * 1.2)
    vb = bench.baseline_comparison(
        base, 0.1, CFG, cur, {"drifted": 1.6, "regressed": 2.0, "flat": 1.0}
    )
    assert vb["queries_within_box_drift"] == ["drifted"]
    assert vb["probe_ratio"]["codegen"] == 1.5


def test_io_ratio_annotated_but_never_widens_envelope():
    # cold-vs-warm io (10x) with flat compute probes: a 5x query step
    # must NOT be absorbed into box drift; the io state is annotated
    base = _base(io=0.01, queries={"scan_heavy": 1.0})
    cur = _cal(codegen=1.0, shuffle=2.0, io=0.1)
    vb = bench.baseline_comparison(base, 0.1, CFG, cur, {"scan_heavy": 5.0})
    assert vb["queries_within_box_drift"] == []
    assert vb["io_cache_state_differs"] == 10.0


def test_no_probe_medians_returns_none():
    base = {"sf": 0.1, "config": dict(CFG), "calibration": {}, "queries": {}}
    assert bench.baseline_comparison(base, 0.1, CFG, _cal(), {}) is None


def test_warmup_names_covers_every_extra_and_filters_headline():
    # full run: every extra is warmed (they are timed single-shot at
    # sf0.1 — an unwarmed extra's number is janino compile + compute),
    # plus the r5 headline warmup set
    names = bench.warmup_names(bench.HEADLINE, bench.EXTRA)
    assert set(bench.EXTRA) <= set(names)
    assert set(bench.WARMUP_HEADLINE) <= set(names)
    # subset run (e.g. the sf10 scaling bench): only the subset is
    # warmed — the warmup must not add a 96-query sweep to a 2-query run
    sub_h = ["dedup_minhash_lsh"]
    sub_e = ["ts_anomalies"]
    assert bench.warmup_names(sub_h, sub_e) == ["dedup_minhash_lsh", "ts_anomalies"]
    # headline-only run: no extras to warm
    assert bench.warmup_names(bench.HEADLINE, []) == bench.WARMUP_HEADLINE


def test_warmup_headline_is_subset_of_headline():
    assert set(bench.WARMUP_HEADLINE) <= set(bench.HEADLINE)


def test_io_probe_shape_and_cache_stamp(tmp_path):
    import os

    p = tmp_path / "t.parquet"
    p.write_bytes(os.urandom(1 << 20))  # 1 MB "parquet" payload
    (tmp_path / "ignored.txt").write_bytes(b"x" * 4096)
    probe = bench._io_probe(str(tmp_path), slice_bytes=1 << 19)
    assert probe["runs"] == 1 and probe["median"] == probe["min"]
    assert probe["slice_bytes"] == 1 << 19  # bounded below file size
    assert probe["tier_bytes"] == 1 << 20  # only .parquet bytes counted
    assert probe["mb_per_s"] is None or probe["mb_per_s"] > 0
