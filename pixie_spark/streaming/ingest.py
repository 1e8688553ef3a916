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
