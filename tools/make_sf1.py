"""Generate the synthetic sf1 bench tier: a ~10× copy of sf0.1 ON DISK.

The round-5 review's last unmeasured claim in the 100 TB story was
disk-resident scale behavior — SCALE.md's 10× tables were built from
in-memory unions. This materializes the same recipe as parquet so
bench.py can run the full headline/extras suite against it:

- FACT tables (lineitem, orders, events, documents, embeddings) are
  duplicated 10× with primary keys shifted by copy·OFFSET; foreign keys
  into dimensions stay unchanged so every join still resolves, and
  l_orderkey/o_orderkey shift together so the order↔lineitem join keeps
  its fan-out. Text/embedding payloads are NOT mutated — each document
  gains 9 exact twins (shifted ids), the adversarially dup-heavy corpus
  SCALE.md's dedup measurements use: true-pair count grows ~45× while a
  sub-linear dedup plan's wall should grow far less than that.
- DIMENSIONS (region, nation, customer, supplier, part) copy through
  1×, as at a real 100 TB deployment (facts grow, dims don't).
- Time columns are untouched: every query's fixture-epoch window simply
  sees 10× the rows, which is the scan-scaling being measured.

The build emits ``out_dir/manifest.json`` — per-table row counts,
per-file sha256 content hashes, and one digest over the lot — and
bench.py copies the digest into its JSON line when it runs against the
tier (round-7 verdict #3): two bench records with the same digest ran
on byte-identical data, so cross-round deltas are attributable to code,
never to a silently different materialization.

Usage:  python tools/make_sf1.py [out_dir]      (default .benchdata/sf1)
Then:   SPARK_GRAFT_SF_DIR=.benchdata/sf1 python bench.py
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pixie_spark.session import get_spark  # noqa: E402

SRC = os.environ.get("SPARK_GRAFT_TIER_SRC", "/root/testdata/sf0.1")
# Higher tiers reuse the same recipe: SPARK_GRAFT_TIER_COPIES=100 with
# the default sf0.1 source materializes the sf10 tier (round-10 verdict
# #1 asked for a measured sf1→sf10 scaling exponent, not more prose).
COPIES = int(os.environ.get("SPARK_GRAFT_TIER_COPIES", "10"))
# well above every sf0.1 key range, and copy·OFFSET stays < 2^53 so the
# shifted ids survive any double round-trip in downstream arithmetic
# (at COPIES=100 the max shift is 990M — still < 2^31, so int32-typed
# key columns survive too)
OFFSET = 10_000_000

DIMS = ["region", "nation", "customer", "supplier", "part"]
# fact table → columns shifted per copy (PKs + the FKs that reference
# another SHIFTED fact, never an unshifted dimension)
FACT_SHIFT = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def _table_file_hashes(table_dir: str) -> dict[str, str]:
    """{part filename: sha256 hex} of the data files in a table dir
    (commit markers / checksums excluded — only bytes queries read)."""
    out = {}
    for name in sorted(os.listdir(table_dir)):
        if not name.endswith(".parquet"):
            continue
        h = hashlib.sha256()
        with open(os.path.join(table_dir, name), "rb") as f:
            for chunk in iter(lambda: f.read(1 << 20), b""):
                h.update(chunk)
        out[name] = h.hexdigest()
    return out


def main() -> None:
    # default output dir names the tier's TRUE sf (copies/10 of the
    # sf0.1 source): bench.py parses sf from the directory name, so a
    # 100-copy tier defaulting into .benchdata/sf1 would stamp sf=1.0
    # onto 10× the data (review r11). COPIES=10 keeps the sf1 default.
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".benchdata", f"sf{COPIES / 10:g}",
    )
    spark = get_spark("make_sf1")
    rows: dict[str, int] = {}
    files: dict[str, dict[str, str]] = {}
    for t in DIMS:
        df = spark.read.parquet(os.path.join(SRC, f"{t}.parquet"))
        df.write.mode("overwrite").parquet(os.path.join(out, f"{t}.parquet"))
        rows[t] = df.count()
        print(f"{t}: {rows[t]} rows (1x)")
    for t, shift_cols in FACT_SHIFT.items():
        base = spark.read.parquet(os.path.join(SRC, f"{t}.parquet"))
        copies = None
        for k in range(COPIES):
            c = base
            for col in shift_cols:
                c = c.withColumn(col, F.col(col) + F.lit(k * OFFSET))
            copies = c if copies is None else copies.unionByName(c)
        # spread copies across files so the scan parallelizes like real
        # ingest output, not 10 concatenated replicas of one layout
        (
            copies.repartition(32)
            .write.mode("overwrite")
            .parquet(os.path.join(out, f"{t}.parquet"))
        )
        n = spark.read.parquet(os.path.join(out, f"{t}.parquet")).count()
        rows[t] = n
        print(f"{t}: {n} rows ({COPIES}x)")
    for t in list(DIMS) + list(FACT_SHIFT):
        files[t] = _table_file_hashes(os.path.join(out, f"{t}.parquet"))
    digest = hashlib.sha256(
        json.dumps({"rows": rows, "files": files}, sort_keys=True).encode()
    ).hexdigest()
    with open(os.path.join(out, "manifest.json"), "w") as f:
        json.dump(
            {"src": SRC, "copies": COPIES, "offset": OFFSET,
             "rows": rows, "files": files, "digest": digest},
            f, indent=1, sort_keys=True,
        )
    print(f"sf1 tier written to {out} (manifest digest {digest[:16]}…)")


if __name__ == "__main__":
    main()
