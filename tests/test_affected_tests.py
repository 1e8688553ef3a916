"""tools/affected_tests.py — machine-derived test selection (r10
verdict #5): the per-commit validation set must come from the import
graph, not builder judgment. These pins keep the selector honest."""

from tools.affected_tests import build_graph, select


def test_always_on_tier_rides_along():
    tests, _ = select(["SCALE.md"])  # doc-only diff
    assert "tests/test_entry.py" in tests
    assert "tests/test_local_oracles.py" in tests
    assert "tests/test_plans.py" in tests


def test_changed_test_file_selects_itself():
    tests, _ = select(["tests/test_phash.py"])
    assert "tests/test_phash.py" in tests


def test_operator_change_reaches_its_tests_transitively():
    # dedup.py → queries.py (registry) → the gate + its own test files;
    # phash.py imports dedup's posting-list pairing, so its tests ride too
    tests, _ = select(["pixie_spark/operators/dedup.py"])
    assert "tests/test_dedup_extra.py" in tests
    assert "tests/test_local_oracles.py" in tests
    assert "tests/test_phash.py" in tests
    # modules dedup never reaches must NOT be dragged in (pprof,
    # timeseries and graph don't touch the dedup family)
    assert "tests/test_pprof.py" not in tests
    assert "tests/test_timeseries.py" not in tests
    assert "tests/test_graph.py" not in tests


def test_sibling_submodules_not_dragged_through_reexporting_package():
    # operators/__init__ re-exports dedup; a dedup edit must not select
    # every sibling's tests just because the package executes on import.
    # pprof.py lives outside the operators package's re-export set and
    # imports nothing dedup-reachable.
    tests, _ = select(["pixie_spark/operators/pprof.py"])
    assert "tests/test_pprof.py" in tests
    assert "tests/test_dedup_extra.py" not in tests
    # …but editing the PACKAGE __init__ itself does fan out to siblings
    tests2, _ = select(["pixie_spark/operators/__init__.py"])
    assert "tests/test_dedup_extra.py" in tests2


def test_conftest_change_escalates_full():
    tests, reason = select(["tests/conftest.py"])
    assert reason.startswith("FULL")
    import os

    here = os.path.join(os.path.dirname(os.path.abspath(__file__)))
    n_files = len([n for n in os.listdir(here)
                   if n.startswith("test_") and n.endswith(".py")])
    assert len(tests) == n_files


def test_graph_sees_lazy_function_level_imports():
    # px.result_stats imports plans.analyze INSIDE the function body —
    # the AST walk must still record the edge
    _mod_of, imports, _implicit = build_graph()
    assert "pixie_spark.plans.analyze" in imports["pixie_spark.api"]


def test_entry_and_bench_are_graph_nodes():
    mod_of, imports, _implicit = build_graph()
    assert "__spark_entry__" in mod_of
    assert "pixie_spark.queries" in imports["bench"]


def test_scaling_report_math_and_config_guard():
    """tools/scaling_report.py (r10 verdict #1): exponent math and the
    cross-config refusal mirror bench.py's own vs_baseline rule."""
    import pytest as _pytest

    from tools.scaling_report import report

    cfg = {"shuffle_partitions": "32", "aqe": "true", "materialize": "lc"}
    a = {"sf": 1.0, "config": cfg, "queries": {"q": 2.0}, "rows_out": {"q": 10}}
    b = {"sf": 10.0, "config": cfg, "queries": {"q": 20.0}, "rows_out": {"q": 100}}
    rows = report(a, b)
    assert rows[0]["wall_ratio"] == 10.0
    assert rows[0]["rows_ratio"] == 10.0
    assert rows[0]["exponent"] == 1.0  # 10× wall on 10× data = linear
    b2 = dict(b, config=dict(cfg, shuffle_partitions="2000"))
    with _pytest.raises(SystemExit, match="config mismatch"):
        report(a, b2)
