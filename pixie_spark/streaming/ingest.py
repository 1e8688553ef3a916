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

Exactly-once: foreachBatch re-runs a failed micro-batch, so every
parquet write here is keyed by a ``batch_id=`` partition and uses
DYNAMIC partition overwrite (the sources/sink.py replay pattern) — a
retried batch REPLACES its own partition instead of duplicating rows,
and the index/old-pairs read side filters ``batch_id < current`` so a
partial write from the failed attempt is never an input to the retry.
tests/test_stateful.py invokes each sink twice with the same batch_id
and asserts the accumulated outputs equal a single run.
"""

from __future__ import annotations

import glob
import os
import re as _re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pixie_spark.operators.incremental import build_index, incremental_pairs

BATCH_COL = "batch_id"


def _write_batch(df: DataFrame, path: str, batch_id: int) -> None:
    """Idempotent micro-batch write: the batch owns exactly its own
    ``batch_id=`` partition; dynamic overwrite makes a foreachBatch
    retry replace that partition byte-for-byte (sources/sink.py
    pattern). An empty batch writes no partitions and deletes none."""
    (
        df.withColumn(BATCH_COL, F.lit(int(batch_id)))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(BATCH_COL)
        .parquet(path)
    )


def _has_batches(path: str) -> bool:
    return bool(glob.glob(os.path.join(path, f"{BATCH_COL}=*")))


def read_accumulated(spark: SparkSession, path: str) -> DataFrame:
    """The accumulated output of an ingest loop, partition column
    dropped — what a plain append sink would have produced, minus the
    duplicate rows a retry would have left behind."""
    return spark.read.parquet(path).drop(BATCH_COL)


def _read_before(
    spark: SparkSession, path: str, batch_id: int, like: DataFrame
) -> DataFrame:
    """Index state visible to ``batch_id``: partitions written by
    EARLIER batches only. A partial write from a failed attempt of this
    very batch is excluded (partition-pruned, not scanned), so the
    retry recomputes from exactly the inputs the first attempt saw."""
    if _has_batches(path):
        return (
            spark.read.parquet(path)
            .where(F.col(BATCH_COL) < int(batch_id))
            .drop(BATCH_COL)
        )
    return spark.createDataFrame([], like.schema)


def ingest_dedup_batch(
    batch_df: DataFrame,
    batch_id: int,
    index_dir: str,
    pairs_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
) -> None:
    """One ingestion step, idempotent under re-invocation with the same
    ``batch_id`` (the foreachBatch retry contract). No per-trigger
    guard job: an empty batch flows through build_index (cheap — the
    plan is lazy and the writes emit zero partitions)."""
    spark = batch_df.sparkSession
    entries_path = os.path.join(index_dir, "entries")
    sigs_path = os.path.join(index_dir, "signatures")
    new_entries, new_sigs = build_index(
        batch_df, id_col, text_col, n=n, num_hashes=num_hashes, bands=bands
    )
    # materialize once: each feeds the pair join AND the index append
    new_entries = new_entries.localCheckpoint()
    new_sigs = new_sigs.localCheckpoint()
    old_entries = _read_before(spark, entries_path, batch_id, new_entries)
    old_sigs = _read_before(spark, sigs_path, batch_id, new_sigs)
    pairs = incremental_pairs(
        new_entries, new_sigs, old_entries, old_sigs,
        num_hashes=num_hashes, threshold=threshold,
    )
    _write_batch(pairs, pairs_dir, batch_id)
    _write_batch(new_entries, entries_path, batch_id)
    _write_batch(new_sigs, sigs_path, batch_id)


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
    est_jaccard) with doc_a in the later batch. All three are
    ``batch_id=``-partitioned for idempotent replay; read them through
    :func:`read_accumulated`.
    """

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        ingest_dedup_batch(
            batch_df, batch_id, index_dir, pairs_dir,
            id_col=id_col, text_col=text_col,
            n=n, num_hashes=num_hashes, bands=bands, threshold=threshold,
        )

    return stream.writeStream.foreachBatch(sink).outputMode("update")


def line_dedup_batch(
    batch_df: DataFrame,
    batch_id: int,
    index_dir: str,
    out_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_chars: int = 1,
    sep: str = "\n",
    key_fn=None,
) -> None:
    """One line-dedup step, idempotent under re-invocation with the
    same ``batch_id``. Null text coalesces to '' exactly as the batch
    operator (operators/dedup.py line_level_dedup) does, preserving
    the stream≡batch duality for null-text docs."""
    spark = batch_df.sparkSession
    lid_path = os.path.join(index_dir, "lids")
    pat = _re.escape(sep)
    arr = F.split(F.coalesce(F.col(text_col), F.lit("")), pat, -1)
    lines = batch_df.select(
        F.col(id_col), F.posexplode(arr).alias("pos", "line")
    ).where(F.length("line") >= min_chars)
    key = key_fn(F.col("line")) if key_fn is not None else F.col("line")
    occ = lines.select(
        id_col, "pos", F.xxhash64(key).alias("lid")
    ).localCheckpoint()
    old = _read_before(
        spark, lid_path, batch_id, spark.createDataFrame([], "lid long")
    )
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
    _write_batch(out, out_dir, batch_id)
    _write_batch(new_owned.select("lid"), lid_path, batch_id)


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
    4. rebuild the batch's docs in-row and write to ``out_dir``;
    5. write the batch's newly-owned lids to the index — earlier
       index generations are never rewritten.

    Over any stream prefix with batch-monotonic doc_ids, the
    accumulated output EQUALS the batch operator on the concatenation
    (duality test in tests/test_stateful.py). Writes are
    ``batch_id=``-partitioned with dynamic overwrite, same replay
    contract as :func:`streaming_ingest_dedup`; read results through
    :func:`read_accumulated`.
    """

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        line_dedup_batch(
            batch_df, batch_id, index_dir, out_dir,
            id_col=id_col, text_col=text_col,
            min_chars=min_chars, sep=sep, key_fn=key_fn,
        )

    return stream.writeStream.foreachBatch(sink).outputMode("update")


def compact_batches(
    spark: SparkSession, path: str, upto_batch_id: int, target_files: int = 1
) -> int:
    """Fold the many small ``batch_id=`` partitions a long-running
    ingest loop accumulates into ONE consolidated partition — the
    streaming-index twin of sources/sink.compact_partitions (the
    small-files problem: one trigger = one partition directory = a few
    tiny files; a month of 1-minute triggers is 43k directories the
    per-trigger index read must list).

    Only partitions with ``batch_id <= upto_batch_id`` are folded, and
    the fold keeps the partition id ``upto_batch_id``; correctness of
    the replay contract is preserved because those batches are already
    COMMITTED in the streaming checkpoint (pick upto = the last batch id
    of a stopped/committed epoch): a future batch N > upto still reads
    the consolidated rows (batch_id <= upto < N), and no batch <= upto
    can ever be replayed once its offset is committed. Returns the
    number of partitions folded. The read side is materialized via an
    eager localCheckpoint before the overwrite so the rewrite never
    reads the files it is deleting (the compact_partitions discipline).
    """
    import glob as _glob

    dirs = [
        d for d in _glob.glob(os.path.join(path, f"{BATCH_COL}=*"))
        if int(d.rsplit("=", 1)[1]) <= upto_batch_id
    ]
    if len(dirs) <= 1:
        return len(dirs)
    folded = (
        spark.read.parquet(path)
        .where(F.col(BATCH_COL) <= int(upto_batch_id))
        .drop(BATCH_COL)
        .coalesce(max(1, int(target_files)))
        .localCheckpoint()
    )
    import shutil

    for d in dirs:
        shutil.rmtree(d)
    _write_batch(folded, path, upto_batch_id)
    return len(dirs)
