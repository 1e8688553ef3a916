"""Scaling-exponent report: two (or more) bench records → a per-query
table of wall-clock and output-cardinality ratios (round-10 verdict #1:
"one committed BENCH_SF10 record turns 'linear by design' into an
observed per-query exponent").

For each query present in every record, prints

    query  t(sfA)  t(sfB)  wall_ratio  rows_ratio  exponent

where ``exponent`` solves wall_ratio = data_ratio**e (e = log(wall) /
log(data)): e≈1 is linear scaling, e<1 sub-linear (fixed overhead still
amortizing), e>1 super-linear — the thing to adjudicate with a profile,
not prose. ``rows_ratio`` (result-set cardinality from the records'
own rows_out) flags output-proportional growth: a dedup whose true-pair
count grows 45× between tiers is ALLOWED a large wall ratio; the
exponent column alone would misread it.

The tool refuses records whose config stamps differ (same rule the
bench's own vs_baseline applies) — a 2000-partition sweep is not a
scaling data point for a 32-partition series.

Usage: python tools/scaling_report.py BENCH_A.json BENCH_B.json [sf_ratio]
(sf_ratio defaults to the records' sf fields' quotient)
"""

from __future__ import annotations

import json
import math
import sys


def load(path: str) -> dict:
    with open(path) as f:
        return json.load(f)


def _config_key(rec: dict) -> tuple:
    cfg = rec.get("config") or {}
    return (
        cfg.get("shuffle_partitions"),
        cfg.get("aqe"),
        cfg.get("materialize"),
    )


def report(a: dict, b: dict, data_ratio: float | None = None) -> list[dict]:
    if _config_key(a) != _config_key(b):
        raise SystemExit(
            f"config mismatch between records: {_config_key(a)} vs "
            f"{_config_key(b)} — not a scaling series"
        )
    if data_ratio is None:
        data_ratio = float(b.get("sf", 0)) / float(a.get("sf", 1) or 1)
    if data_ratio <= 1:
        raise SystemExit(
            f"data_ratio {data_ratio:g} <= 1 — pass records smaller tier "
            "first (exponents are undefined otherwise)"
        )
    qa = {**a.get("queries", {}), **a.get("extra_queries", {})}
    qb = {**b.get("queries", {}), **b.get("extra_queries", {})}
    ra, rb = a.get("rows_out", {}), b.get("rows_out", {})
    out = []
    for q in sorted(set(qa) & set(qb)):
        if not qa[q]:
            continue
        wall = qb[q] / qa[q]
        rows = (rb.get(q) / ra.get(q)) if ra.get(q) and rb.get(q) else None
        exp = (
            math.log(wall) / math.log(data_ratio)
            if wall > 0 and data_ratio > 1
            else None
        )
        out.append(
            {
                "query": q,
                "t_a": qa[q],
                "t_b": qb[q],
                "wall_ratio": round(wall, 2),
                "rows_ratio": round(rows, 2) if rows is not None else None,
                "exponent": round(exp, 3) if exp is not None else None,
            }
        )
    return out


def main() -> None:
    a, b = load(sys.argv[1]), load(sys.argv[2])
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else None
    rows = report(a, b, ratio)
    dr = ratio or (float(b.get("sf", 0)) / float(a.get("sf", 1) or 1))
    print(f"| query | t@sf{a.get('sf')} | t@sf{b.get('sf')} | wall× | rows× | exponent (data {dr:g}×) |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['query']} | {r['t_a']} | {r['t_b']} | {r['wall_ratio']} "
            f"| {r['rows_ratio'] if r['rows_ratio'] is not None else '—'} "
            f"| {r['exponent'] if r['exponent'] is not None else '—'} |"
        )


if __name__ == "__main__":
    main()
