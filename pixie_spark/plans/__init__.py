"""Plan inspection & scale assertions.

The reference exposes per-operator execution stats when analyze=true
(carnot.cc:371-400) and px.debug; here the contract is Catalyst's
explain output, plus assertion helpers the test-suite uses to enforce
100 TB-readiness properties: filters reach the scan, dimension joins
broadcast, aggregates are two-phase, projections prune columns.
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def assert_pushed_filter(df: DataFrame, fragment: str) -> None:
    """Assert a predicate reached the data source (PushedFilters: [...])."""
    plan = plan_string(df)
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    if not any(fragment in p for p in pushed):
        raise AssertionError(f"filter {fragment!r} not pushed to scan; PushedFilters={pushed}\n{plan}")


def assert_read_schema_only(df: DataFrame, columns: set[str]) -> None:
    """Assert column pruning: the scan reads exactly these columns."""
    plan = plan_string(df)
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    for s in schemas:
        read = {c.split(":")[0].strip() for c in s.split(",") if c.strip()}
        if not read <= columns:
            raise AssertionError(f"scan reads {read - columns} beyond {columns}\n{plan}")


def assert_broadcast_join(df: DataFrame, expect: int = 1) -> None:
    """Assert at least `expect` broadcast joins (dimension sides never
    shuffle the fact table)."""
    plan = plan_string(df)
    n = plan.count("BroadcastHashJoin") + plan.count("BroadcastNestedLoopJoin")
    if n < expect:
        raise AssertionError(f"expected ≥{expect} broadcast joins, found {n}\n{plan}")


def assert_partial_agg(df: DataFrame) -> None:
    """Assert two-phase aggregation (partial + final HashAggregate) — the
    Spark analogue of the reference's PEM/Kelvin partial/finalize split
    (partial_op_mgr.h:72-106)."""
    plan = plan_string(df)
    if len(re.findall(r"HashAggregate", plan)) < 2 and "partial" not in plan.lower():
        raise AssertionError(f"no partial aggregation found\n{plan}")


def assert_no_cartesian(df: DataFrame) -> None:
    plan = plan_string(df)
    if "CartesianProduct" in plan:
        raise AssertionError(f"cartesian product in plan\n{plan}")


def wholestage_codegen_spans(df: DataFrame) -> int:
    """Count WholeStageCodegen subtrees — wider/more is better (SURVEY
    'stay JVM-side'). NOTE: under AQE the pre-execution plan hides
    codegen; call with spark.sql.adaptive.enabled=false (see
    tests/test_plans.py) or on an executed plan."""
    out = plan_string(df, "codegen")
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", out)
    if m and int(m.group(1)) > 0:
        return int(m.group(1))
    return len(set(re.findall(r"WholeStageCodegen \((\d+)\)", plan_string(df, "simple"))))
