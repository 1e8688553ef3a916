"""Streaming ingestion dedup: the production crawl-ingest loop.

A live corpus is not deduplicated by re-minhashing 100 TB per arrival;
the production shape (Lee et al. 2022 §4's daily-snapshot loop, run
continuously) is a PERSISTED MinHash-LSH index plus, per micro-batch:

    1. signature + band entries for the batch (operators/incremental.
       build_index — deterministic xxhash64 end-to-end),
    2. near-dup pairs INVOLVING the batch: new-vs-corpus via a
       broadcast probe of the stored entries (the corpus index never
       shuffles) and new-vs-new via the ordinary posting-list path
       (operators/incremental.incremental_pairs),
    3. append the batch's rows to the index — yesterday's corpus is
       never rewritten.

Because hashing is deterministic and every pair involves the LATER
document's batch, the accumulated pair set over any stream prefix
EQUALS a full from-scratch rebuild over the same prefix — the
incremental ≡ rebuild theorem of operators/incremental.py iterated
per micro-batch (duality test in tests/test_stateful.py).

Exactly-once caveat: foreachBatch re-runs a failed micro-batch, so the
parquet appends here are at-least-once; a production deployment keys
the pair/index writes by ``batch_id`` partition (the sources/sink.py
idempotent-replay pattern) so a re-run overwrites its own partition
instead of duplicating rows.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from pixie_spark.operators.incremental import build_index, incremental_pairs


def streaming_ingest_dedup(
    stream: DataFrame,
    index_dir: str,
    pairs_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
):
    """writeStream writer whose foreachBatch runs the ingestion loop.

    The caller configures trigger/checkpoint and starts it:
    ``streaming_ingest_dedup(...).trigger(availableNow=True).start()``.
    ``{index_dir}/entries`` + ``{index_dir}/signatures`` hold the
    persisted index; ``pairs_dir`` accumulates (doc_a, doc_b,
    est_jaccard) with doc_a in the later batch.
    """
    entries_path = os.path.join(index_dir, "entries")
    sigs_path = os.path.join(index_dir, "signatures")

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        spark = batch_df.sparkSession
        new_entries, new_sigs = build_index(
            batch_df, id_col, text_col, n=n, num_hashes=num_hashes, bands=bands
        )
        # materialize once: each feeds the pair join AND the index append
        new_entries = new_entries.localCheckpoint()
        new_sigs = new_sigs.localCheckpoint()
        if os.path.exists(entries_path):
            old_entries = spark.read.parquet(entries_path)
            old_sigs = spark.read.parquet(sigs_path)
        else:
            old_entries = spark.createDataFrame([], new_entries.schema)
            old_sigs = spark.createDataFrame([], new_sigs.schema)
        pairs = incremental_pairs(
            new_entries, new_sigs, old_entries, old_sigs,
            num_hashes=num_hashes, threshold=threshold,
        )
        pairs.write.mode("append").parquet(pairs_dir)
        new_entries.write.mode("append").parquet(entries_path)
        new_sigs.write.mode("append").parquet(sigs_path)

    return stream.writeStream.foreachBatch(sink).outputMode("update")


def streaming_line_dedup(
    stream: DataFrame,
    index_dir: str,
    out_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_chars: int = 1,
    sep: str = "\n",
    key_fn=None,
):
    """writeStream writer: continuous corpus-wide LINE dedup (the
    streaming twin of operators/dedup.line_level_dedup, keep-first by
    arrival order then (doc_id, pos)) against a persisted line-hash
    index.

    Per micro-batch, all on 8-byte lids (line text never shuffles):

    1. explode batch docs to ``(doc_id, pos, lid)`` where ``lid`` is
       ``xxhash64`` of the (optionally ``key_fn``-normalized) line;
    2. within-batch keep-first via the same map-side-combinable
       ``min(struct(doc_id, pos))`` agg as the batch operator;
    3. drop every occurrence of a lid already in the index (left-semi
       on the stored lid column) plus within-batch repeats;
    4. rebuild the batch's docs in-row and append to ``out_dir``;
    5. append the batch's newly-owned lids to the index — earlier
       index generations are never rewritten.

    Over any stream prefix with batch-monotonic doc_ids, the
    accumulated output EQUALS the batch operator on the concatenation
    (duality test in tests/test_stateful.py). Same at-least-once
    caveat as :func:`streaming_ingest_dedup` — production keys the
    out/index appends by batch_id partition for idempotent replay.
    """
    import re as _re

    lid_path = os.path.join(index_dir, "lids")
    pat = _re.escape(sep)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        from pyspark.sql import functions as F

        spark = batch_df.sparkSession
        arr = F.split(F.col(text_col), pat, -1)
        lines = batch_df.select(
            F.col(id_col), F.posexplode(arr).alias("pos", "line")
        ).where(F.length("line") >= min_chars)
        key = key_fn(F.col("line")) if key_fn is not None else F.col("line")
        occ = lines.select(
            id_col, "pos", F.xxhash64(key).alias("lid")
        ).localCheckpoint()
        if os.path.exists(lid_path):
            old = spark.read.parquet(lid_path)
        else:
            old = spark.createDataFrame([], "lid long")
        first = occ.groupBy("lid").agg(
            F.min(F.struct(id_col, "pos")).alias("first_occ")
        )
        new_owned = first.join(old, "lid", "left_anti").localCheckpoint()
        seen_drops = occ.join(old, "lid", "left_semi").select(id_col, "pos")
        batch_dups = (
            occ.join(new_owned, "lid")
            .where(
                (F.col(f"first_occ.{id_col}") != F.col(id_col))
                | (F.col("first_occ.pos") != F.col("pos"))
            )
            .select(id_col, "pos")
        )
        drops = seen_drops.union(batch_dups).groupBy(id_col).agg(
            F.collect_set("pos").alias("__drop_pos")
        )
        kept = F.filter(
            arr,
            lambda x, i: ~F.coalesce(
                F.array_contains(F.col("__drop_pos"), i), F.lit(False)
            ),
        )
        out = batch_df.join(drops, id_col, "left").select(
            F.col(id_col),
            F.array_join(kept, sep).alias(text_col),
            F.size(arr).cast("long").alias("n_lines"),
            (F.size(arr) - F.size(kept)).cast("long").alias("n_lines_dropped"),
        )
        out.write.mode("append").parquet(out_dir)
        new_owned.select("lid").write.mode("append").parquet(lid_path)

    return stream.writeStream.foreachBatch(sink).outputMode("update")
