"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
at the given sf dir, compares row count, column names, and values
order-insensitively. Floats are rounded to 9 decimals then compared
exactly — matching the repo's dround convention (every query pre-rounds
computed doubles), deliberately as strict as the driver's value-hash.
Rows-only queries (no oracle) must return ≥1 row. Exits nonzero on any
mismatch.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from pixie_spark.session import get_spark
from pixie_spark.sources import TESTDATA_TABLES


def _sort_key_scalar(v):
    """Type-stable, engine-independent sort key: numbers sort numerically
    (int64 vs float64 dtype differences between Spark and DuckDB must not
    reorder rows — str() would put 1.7e+18 before 15), everything else by
    class then string form."""
    if v is None:
        return (0, 0.0, "")
    if isinstance(v, bool):
        return (1, float(v), "")
    if isinstance(v, (int, float)):
        if isinstance(v, float) and math.isnan(v):
            return (3, 0.0, "")
        # secondary exact key: float(v) collapses int64 > 2^53 (256-ns ties
        # at epoch scale would sort in engine-arrival order)
        return (2, float(v), str(v))
    return (4, 0.0, str(v))


def _dtype_mismatches(sdf, odf):
    """Columns whose pandas dtype *kind* differs between engines.

    Kind-level (int vs float vs bool vs object vs datetime) is the right
    granularity: the driver's value-hash distinguishes 23 from 23.0 but
    not int32 from int64. Null-coerced columns (int→float64 when nulls
    present) coerce identically in both engines' pandas conversions, so
    kinds still agree when values do.
    """
    bad = []
    for c in sdf.columns:
        sk, ok = sdf[c].dtype.kind, odf[c].dtype.kind
        if sk != ok:
            bad.append((c, str(sdf[c].dtype), str(odf[c].dtype)))
    return bad


def _norm_scalar(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else round(v, 9)
    return v


def normalize(rows, colnames):
    out = []
    for row in rows:
        vals = []
        for c in sorted(colnames):
            v = row[c]
            # array-valued columns: Spark's toPandas gives numpy arrays,
            # DuckDB's fetchdf gives lists — canonicalize both to tuples
            # so row equality/sorting never hits numpy's ambiguous ==
            if hasattr(v, "tolist") and not isinstance(v, (str, bytes)):
                v = v.tolist()
            if isinstance(v, (list, tuple)):
                v = ("<list>", tuple(_norm_scalar(x) for x in v))
            else:
                v = _norm_scalar(v)
            vals.append((c, v))
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple(_sort_key_scalar(x) for _, x in t))
    return out


def compare_frames(sdf, odf) -> list[str]:
    """The gate's comparison, shared with CI (tests/test_local_oracles):
    row count → column names → pandas dtype *kind* (the driver hashes
    raw values: int 23 != float 23.0 — round-1 math_ops/sessionize
    failures) → order-insensitive normalized values. Returns problem
    strings; empty list = match."""
    if len(sdf) != len(odf):
        return [f"row count spark={len(sdf)} duckdb={len(odf)}"]
    if sorted(sdf.columns) != sorted(odf.columns):
        return [f"columns spark={sorted(sdf.columns)} duckdb={sorted(odf.columns)}"]
    bad = _dtype_mismatches(sdf, odf)
    if bad:
        return [f"dtype of '{c}' spark={sk} duckdb={okd}" for c, sk, okd in bad]
    s_rows = normalize(sdf.to_dict("records"), list(sdf.columns))
    o_rows = normalize(odf.to_dict("records"), list(odf.columns))
    if s_rows != o_rows:
        diffs = [i for i, (a, b) in enumerate(zip(s_rows, o_rows)) if a != b]
        out = [f"{len(diffs)} differing rows of {len(s_rows)}"]
        for i in diffs[:3]:
            out.append(f"  spark : {s_rows[i]}")
            out.append(f"  duckdb: {o_rows[i]}")
        return out
    return []


def oracle_connection(sf_dir: str):
    """DuckDB connection with the testdata views and the spark-hash UDF
    replicas registered — everything a local_oracle may reference."""
    from tools.spark_hash import (
        minhash_mix64,
        xxhash64_chain,
        xxhash64_long,
        xxhash64_long_int,
        xxhash64_longs,
        xxhash64_str,
        xxhash64_str_int,
        xxhash64_words,
    )

    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(path):
            # Spark-written layout (a directory of part files, e.g. the
            # .benchdata/sf1 tier) — register the part-file glob instead.
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}/*.parquet'")
        elif os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    con.create_function(
        "spark_xxhash64", lambda v: xxhash64_long(v), ["BIGINT"], "BIGINT"
    )
    con.create_function(
        "spark_xxhash64_int",
        lambda v, i: xxhash64_long_int(v, i),
        ["BIGINT", "INTEGER"],
        "BIGINT",
    )
    con.create_function(
        "spark_xxhash64_str", lambda v: xxhash64_str(v), ["VARCHAR"], "BIGINT"
    )
    con.create_function(
        "spark_xxhash64_str_int",
        lambda v, i: xxhash64_str_int(v, i),
        ["VARCHAR", "INTEGER"],
        "BIGINT",
    )
    con.create_function(
        "spark_xxhash64_words",
        lambda ws: xxhash64_words(ws),
        ["VARCHAR[]"],
        "BIGINT",
    )
    con.create_function(
        "spark_xxhash64_chain",
        lambda ps: xxhash64_chain(ps),
        ["VARCHAR[]"],
        "BIGINT",
    )
    con.create_function(
        "spark_xxhash64_longs",
        lambda vs: xxhash64_longs(vs),
        ["BIGINT[]"],
        "BIGINT",
    )
    con.create_function(
        "spark_minhash_mix64",
        lambda h1, h2: minhash_mix64(h1, h2),
        ["BIGINT", "BIGINT"],
        "BIGINT[]",
    )
    return con


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark("check_oracle")
    # Spark-hash UDF replicas are for LOCAL oracles only (the driver's
    # DuckDB has no UDFs — driver-facing oracle_sql() must never
    # reference them).
    con = oracle_connection(sf_dir)

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    from pixie_spark.queries import QUERIES as _specs

    local_oracles = {
        n: s.local_oracle
        for n, s in _specs.items()
        if s.local_oracle is not None and n not in oracles
    }
    if only:
        unknown = only - set(qs)
        if unknown:
            print(f"ERROR: unknown query names: {sorted(unknown)}")
            return 1
    failed, passed, local_passed, rows_only = [], [], [], []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failed.append(name)
            continue
        is_local = name not in oracles and name in local_oracles
        if name not in oracles and not is_local:
            allow_empty = _specs[name].allow_empty if name in _specs else False
            if len(sdf) == 0 and not allow_empty:
                print(f"FAIL {name}: rows-only query returned 0 rows")
                failed.append(name)
            else:
                print(f"rows-only {name}: {len(sdf)} rows ({time.time()-t0:.1f}s)")
                rows_only.append(name)
            continue
        sql = local_oracles[name] if is_local else oracles[name]
        try:
            odf = con.execute(sql).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            failed.append(name)
            continue
        problems = compare_frames(sdf, odf)
        for p in problems:
            print(f"FAIL {name}: {p}")
        if not problems:
            tag = "PASS-LOCAL" if is_local else "PASS"
            print(f"{tag} {name}: {len(sdf)} rows ({time.time()-t0:.1f}s)")
            (local_passed if is_local else passed).append(name)
        else:
            failed.append(name)

    print(
        f"\n{len(passed)} passed, {len(local_passed)} local-oracle passed, "
        f"{len(rows_only)} rows-only, {len(failed)} failed"
    )
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
