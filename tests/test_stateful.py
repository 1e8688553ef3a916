"""Custom stateful streaming operator (applyInPandasWithState): final
per-key state over a stream must equal the batch aggregate of the same
data — state survives across micro-batches."""

import os
import shutil
import time

import pytest
from pyspark.sql import functions as F

from pixie_spark.streaming.stateful import running_totals


@pytest.fixture(scope="module")
def events_parts(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("stateful_events"))
    df = spark.range(0, 1000).select(
        (F.col("id") % 7).alias("user_id"),
        (F.col("id") * 1.5).alias("value"),
        (F.col("id") * 1_000_000).alias("time_"),
    )
    # several files → several micro-batches with maxFilesPerTrigger=1
    df.repartition(4).write.mode("overwrite").parquet(d)
    return d, df.schema


def test_stateful_running_totals_match_batch(spark, events_parts, tmp_path):
    d, schema = events_parts
    batch = running_totals(spark.read.schema(schema).parquet(d), "user_id", "value", "time_")
    expected = {
        r["user_id"]: (r["n_events"], r["total"], r["last_seen"]) for r in batch.collect()
    }

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(d)
    )
    out = running_totals(stream, "user_id", "value", "time_")
    q = (
        out.writeStream.format("memory")
        .queryName("stateful_totals")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        t0 = time.time()
        while time.time() - t0 < 90:
            p = q.lastProgress
            if p is not None and p.get("numInputRows", -1) == 0:
                break
            time.sleep(1)
        # memory sink in update mode appends every update — take the LAST
        # emitted row per key (the final state)
        rows = spark.sql(
            """
            SELECT user_id, n_events, total, last_seen FROM (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY n_events DESC) rn
                FROM stateful_totals
            ) WHERE rn = 1
            """
        ).collect()
        got = {r["user_id"]: (r["n_events"], r["total"], r["last_seen"]) for r in rows}
        assert got == expected
    finally:
        q.stop()


def test_streaming_anomalies_match_batch(spark, tmp_path):
    """Stream≡batch duality for the anomaly detector: per-entity
    trailing-z flags computed incrementally across micro-batches (the
    baseline window living in the state store) equal the batch window
    computation over the union — including a spike planted in a LATER
    micro-batch whose baseline was built in earlier ones."""
    import numpy as np
    from pyspark.sql import types as T

    import pixie_spark.streaming as S
    from pixie_spark.streaming.stateful import streaming_anomalies

    rng = np.random.default_rng(21)
    rows = []
    for e in ("svc-a", "svc-b"):
        vs = list(rng.normal(loc=10, scale=1, size=90))
        vs[60] = 40.0  # spike lands in the third micro-batch
        rows += [(e, t, float(v)) for t, v in enumerate(vs)]
    schema = T.StructType(
        [
            T.StructField("entity", T.StringType()),
            T.StructField("ts", T.LongType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    src = str(tmp_path / "anom_src")
    # three sequential appends → three micro-batches in event-time order
    for lo, hi in ((0, 30), (30, 60), (60, 90)):
        part = [r for r in rows if lo <= r[1] < hi]
        spark.createDataFrame(part, schema).coalesce(1).write.mode(
            "append" if lo else "overwrite"
        ).parquet(src)

    batch = streaming_anomalies(spark.createDataFrame(rows, schema))
    expected = {
        (r["entity"], r["ts"]): (
            r["baseline_n"],
            None if r["z"] is None else round(r["z"], 6),
            r["is_anomaly"],
        )
        for r in batch.collect()
    }

    stream = S.stream_table(spark, src, schema, max_files_per_trigger=1)
    out = streaming_anomalies(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("anom_stream_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r["entity"], r["ts"]): (
            r["baseline_n"],
            None if r["z"] is None else round(r["z"], 6),
            r["is_anomaly"],
        )
        for r in spark.sql("SELECT * FROM anom_stream_out").collect()
    }
    assert got == expected
    # and the planted spike was flagged from state built in PRIOR batches
    assert got[("svc-a", 60)][2] and got[("svc-b", 60)][2]


def test_streaming_pattern_match_equals_batch(spark, tmp_path):
    """Stream≡batch duality for signature matching: a planted shape
    SPANNING a micro-batch boundary must still fire (its window's
    history lives in the state store), and the full match set equals
    the batch operator's thresholded output."""
    import numpy as np
    from pyspark.sql import types as T

    import pixie_spark.streaming as S
    from pixie_spark.streaming.stateful import streaming_pattern_match

    spike = [0.0, 2.0, 6.0, 2.0, 0.0]
    rng = np.random.default_rng(3)
    base = list(rng.normal(loc=5.0, scale=0.2, size=60))
    # plant the exact shape at t=28 — crossing the t=30 batch boundary
    for i, v in enumerate(spike):
        base[28 + i] = 5.0 + v
    rows = [("svc", t, float(v)) for t, v in enumerate(base)]
    schema = T.StructType(
        [
            T.StructField("entity", T.StringType()),
            T.StructField("ts", T.LongType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    src = str(tmp_path / "pat_src")
    for lo, hi in ((0, 30), (30, 60)):
        part = [r for r in rows if lo <= r[1] < hi]
        spark.createDataFrame(part, schema).coalesce(1).write.mode(
            "append" if lo else "overwrite"
        ).parquet(src)

    batch = streaming_pattern_match(
        spark.createDataFrame(rows, schema), spike, max_dist=0.5
    )
    expected = {(r["entity"], r["ts"]): round(r["dist"], 9) for r in batch.collect()}
    assert ("svc", 28) in expected  # the planted shape is a batch match

    stream = S.stream_table(spark, src, schema, max_files_per_trigger=1)
    out = streaming_pattern_match(stream, spike, max_dist=0.5)
    q = (
        out.writeStream.format("memory")
        .queryName("pat_stream_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r["entity"], r["ts"]): round(r["dist"], 9)
        for r in spark.sql("SELECT * FROM pat_stream_out").collect()
    }
    assert got == expected


def test_pattern_match_batch_fallback_no_driver_topk(spark):
    # The batch fallback must filter dist <= max_dist distributedly —
    # no global orderBy+limit (TakeOrdered), which would collect the
    # entire scored window set onto the driver for a large frame.
    from pixie_spark.streaming.stateful import streaming_pattern_match

    df = spark.createDataFrame(
        [("e", i, float(i % 5)) for i in range(50)],
        "entity string, ts long, value double",
    )
    out = streaming_pattern_match(df, [1.0, 2.0, 3.0], max_dist=0.5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrdered" not in plan


def test_streaming_resample_ffill_equals_batch(spark, tmp_path):
    """Stream≡batch duality for grid resampling: irregular per-entity
    series arriving across micro-batch boundaries must emit exactly the
    grid points the batch operator produces over the same data —
    including leading nulls before an entity's first observation, fills
    at grid==obs ties, and the staleness horizon. Only grid points at
    or before each entity's LAST observation are comparable (the batch
    operator sees the whole series at once; the stream finalizes a
    point when a later obs arrives)."""
    from pyspark.sql import types as T

    import pixie_spark.streaming as S
    from pixie_spark.streaming.stateful import streaming_resample_ffill

    step = 100
    rows = [
        # entity a: starts mid-bucket, has a long gap exceeding the
        # horizon, and an observation exactly ON a grid point
        ("a", 135, 1.0), ("a", 240, 2.0), ("a", 300, 3.0), ("a", 810, 4.0),
        # entity b: dense, no gaps
        ("b", 95, 10.0), ("b", 180, 11.0), ("b", 210, 12.0), ("b", 415, 13.0),
    ]
    schema = T.StructType(
        [
            T.StructField("entity", T.StringType()),
            T.StructField("ts", T.LongType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    src = str(tmp_path / "rsf_src")
    for lo, hi in ((0, 250), (250, 500), (500, 900)):
        part = [r for r in rows if lo <= r[1] < hi]
        spark.createDataFrame(part, schema).coalesce(1).write.mode(
            "append" if lo else "overwrite"
        ).parquet(src)

    batch = streaming_resample_ffill(
        spark.createDataFrame(rows, schema), step, max_fill_steps=3
    )
    last_obs = {"a": 810, "b": 415}
    expected = {
        (r["entity"], r["ts"]): (r["value"], r["filled"])
        for r in batch.collect()
        if r["ts"] <= last_obs[r["entity"]]
    }
    # sanity on the batch side: horizon nulls the >3-step gap for a
    assert expected[("a", 700)] == (None, False)
    assert expected[("a", 400)] == (3.0, True)

    stream = S.stream_table(spark, src, schema, max_files_per_trigger=1)
    out = streaming_resample_ffill(stream, step, max_fill_steps=3)
    q = (
        out.writeStream.format("memory")
        .queryName("rsf_stream_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r["entity"], r["ts"]): (r["value"], r["filled"])
        for r in spark.sql("SELECT * FROM rsf_stream_out").collect()
    }
    assert got == expected


def test_streaming_ingest_dedup_equals_full_rebuild(spark, tmp_path):
    """The streaming ingestion loop (streaming/ingest.py) over three
    arrival chunks must accumulate EXACTLY the pair set a from-scratch
    MinHash rebuild over the whole prefix produces — near-dups planted
    both within one chunk and ACROSS chunks (the case that needs the
    persisted index), with identical est_jaccard values."""
    from pyspark.sql import types as T

    import pixie_spark.streaming as S
    from pixie_spark.operators.dedup import minhash_lsh_pairs
    from pixie_spark.streaming.ingest import streaming_ingest_dedup

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    mk = lambda i, extra: (i, f"{base} {extra} doc{i % 3}")  # noqa: E731
    rows = [
        mk(1, "one"), mk(2, "two"),          # chunk 1
        mk(3, "one"), mk(4, "four"),         # chunk 2: 3 ~ 1 (cross-chunk)
        mk(5, "two"), mk(6, "one"),          # chunk 3: 5 ~ 2, 6 ~ 1 & 3
    ]
    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    src = str(tmp_path / "ingest_src")
    for idx, chunk in enumerate([rows[:2], rows[2:4], rows[4:]]):
        spark.createDataFrame(chunk, schema).coalesce(1).write.mode(
            "append" if idx else "overwrite"
        ).parquet(src)

    stream = S.stream_table(spark, src, schema, max_files_per_trigger=1)
    writer = streaming_ingest_dedup(
        stream, str(tmp_path / "index"), str(tmp_path / "pairs"),
        n=3, num_hashes=64, bands=64, threshold=0.5,
    )
    q = writer.option(
        "checkpointLocation", str(tmp_path / "ckpt")
    ).trigger(availableNow=True).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    from pixie_spark.streaming.ingest import read_accumulated

    got = {
        frozenset((r["doc_a"], r["doc_b"])): round(r["est_jaccard"], 9)
        for r in read_accumulated(spark, str(tmp_path / "pairs")).collect()
    }
    full = {
        frozenset((r["doc_a"], r["doc_b"])): round(r["est_jaccard"], 9)
        for r in minhash_lsh_pairs(
            spark.createDataFrame(rows, schema), "doc_id", "text",
            n=3, num_hashes=64, bands=64, threshold=0.5,
        ).collect()
    }
    assert got == full
    assert any({1, 3} == set(k) for k in got)  # the cross-chunk pair fired
    # and the persisted index grew to cover every ingested doc
    sigs = spark.read.parquet(str(tmp_path / "index" / "signatures"))
    assert sigs.count() == len(rows)


def test_streaming_line_dedup_equals_batch_operator(spark, tmp_path):
    """Continuous line dedup over three arrival chunks must produce,
    accumulated, EXACTLY what the batch line_level_dedup computes on
    the concatenated corpus — duplicate lines planted within one
    chunk, across chunks (the persisted-index case), and within one
    document."""
    from pyspark.sql import types as T

    import pixie_spark.streaming as S
    from pixie_spark.operators.dedup import line_level_dedup
    from pixie_spark.streaming.ingest import streaming_line_dedup

    rows = [
        (1, "Shared boilerplate header line.\nBody of document one."),
        (2, "Body of document two.\nBody of document two."),       # within-doc dup
        (3, "Shared boilerplate header line.\nBody of document three."),  # cross-chunk
        (4, "Unique content for document four.\n\nShared boilerplate header line."),
        (5, "Body of document one.\nFresh tail line for five."),   # cross-chunk
        (6, "Shared boilerplate header line."),                    # whole doc dies
    ]
    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    src = str(tmp_path / "ld_src")
    for idx, chunk in enumerate([rows[:2], rows[2:4], rows[4:]]):
        spark.createDataFrame(chunk, schema).coalesce(1).write.mode(
            "append" if idx else "overwrite"
        ).parquet(src)

    stream = S.stream_table(spark, src, schema, max_files_per_trigger=1)
    writer = streaming_line_dedup(
        stream, str(tmp_path / "ld_index"), str(tmp_path / "ld_out")
    )
    q = writer.option(
        "checkpointLocation", str(tmp_path / "ld_ckpt")
    ).trigger(availableNow=True).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    from pixie_spark.streaming.ingest import read_accumulated

    got = {
        r["doc_id"]: r.asDict()
        for r in read_accumulated(spark, str(tmp_path / "ld_out")).collect()
    }
    exp = {
        r["doc_id"]: r.asDict()
        for r in line_level_dedup(spark.createDataFrame(rows, schema)).collect()
    }
    assert got == exp
    assert got[3]["text"] == "Body of document three."   # cross-chunk drop fired
    assert got[6]["text"] == ""                           # whole doc died
    assert got[2]["n_lines_dropped"] == 1                 # within-doc keep-first
    # index holds one lid per distinct eligible line
    lids = spark.read.parquet(str(tmp_path / "ld_index" / "lids"))
    distinct_lines = {
        l for _, t in rows for l in t.split("\n") if len(l) >= 1
    }
    assert lids.count() == len(distinct_lines)


def test_ingest_dedup_retry_is_idempotent(spark, tmp_path):
    """foreachBatch's retry contract: re-invoking a batch sink with the
    SAME batch_id must leave pairs/index identical to a single run —
    the batch_id-partitioned dynamic-overwrite writes replace the
    batch's own partition instead of appending a duplicate copy
    (round-5 review ask #1)."""
    from pyspark.sql import types as T

    from pixie_spark.streaming.ingest import ingest_dedup_batch, read_accumulated

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    b0 = spark.createDataFrame([(1, f"{base} one"), (2, f"{base} two")], schema)
    b1 = spark.createDataFrame([(3, f"{base} one"), (4, f"{base} four")], schema)
    idx, pairs = str(tmp_path / "index"), str(tmp_path / "pairs")
    kw = dict(n=3, num_hashes=64, bands=64, threshold=0.5)

    ingest_dedup_batch(b0, 0, idx, pairs, **kw)
    ingest_dedup_batch(b1, 1, idx, pairs, **kw)
    snap = lambda p: sorted(  # noqa: E731
        map(str, read_accumulated(spark, p).collect())
    )
    one_run = {
        p: snap(str(tmp_path / p))
        for p in ["pairs", "index/entries", "index/signatures"]
    }
    assert any(
        {r["doc_a"], r["doc_b"]} == {1, 3}
        for r in read_accumulated(spark, pairs).collect()
    )
    # simulate the retry: batch 1 runs AGAIN with the same batch_id
    ingest_dedup_batch(b1, 1, idx, pairs, **kw)
    for p, want in one_run.items():
        assert snap(str(tmp_path / p)) == want, p
    # and a partial failed attempt of batch 2 must be invisible to the
    # retry's index read (batch_id < current prunes it): run batch 2
    # twice and the pair set still equals the clean accumulation
    b2 = spark.createDataFrame([(5, f"{base} two")], schema)
    ingest_dedup_batch(b2, 2, idx, pairs, **kw)
    ingest_dedup_batch(b2, 2, idx, pairs, **kw)
    got = {
        frozenset((r["doc_a"], r["doc_b"]))
        for r in read_accumulated(spark, pairs).collect()
    }
    assert frozenset((5, 2)) in got
    assert all(len(k) == 2 for k in got)  # no self-pairs from replayed index


def test_line_dedup_retry_is_idempotent_and_null_text(spark, tmp_path):
    """(a) Re-running a line-dedup batch with the same batch_id leaves
    out/index identical to a single run. (b) A null-text doc flows
    through the streaming sink exactly as through the batch operator
    (text='', n_lines=1) — the round-5 ADVICE coalesce fix."""
    from pyspark.sql import types as T

    from pixie_spark.operators.dedup import line_level_dedup
    from pixie_spark.streaming.ingest import line_dedup_batch, read_accumulated

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    b0 = spark.createDataFrame(
        [(1, "shared line\nbody one"), (2, None)], schema
    )
    b1 = spark.createDataFrame([(3, "shared line\nbody three")], schema)
    idx, out = str(tmp_path / "ld_index"), str(tmp_path / "ld_out")

    line_dedup_batch(b0, 0, idx, out)
    line_dedup_batch(b1, 1, idx, out)
    snap = lambda p: sorted(  # noqa: E731
        map(str, read_accumulated(spark, p).collect())
    )
    one_run = {p: snap(str(tmp_path / p)) for p in ["ld_out", "ld_index/lids"]}
    line_dedup_batch(b1, 1, idx, out)  # the retry
    for p, want in one_run.items():
        assert snap(str(tmp_path / p)) == want, p

    got = {
        r["doc_id"]: r.asDict()
        for r in read_accumulated(spark, out).collect()
    }
    exp = {
        r["doc_id"]: r.asDict()
        for r in line_level_dedup(
            spark.createDataFrame(
                [(1, "shared line\nbody one"), (2, None),
                 (3, "shared line\nbody three")], schema
            )
        ).collect()
    }
    assert got == exp
    assert got[2]["text"] == "" and got[2]["n_lines"] == 1  # null-text duality
    assert got[3]["text"] == "body three"  # cross-batch drop survived the retry


def _kill_after_first_output(q, out_dir, timeout_s=90):
    """Wait until the running query has committed at least one output
    partition, then stop it — a mid-stream kill. Returns the number of
    batch partitions committed before the kill."""
    import glob
    import time as _t

    t0 = _t.time()
    while _t.time() - t0 < timeout_s:
        done = glob.glob(os.path.join(out_dir, "batch_id=*"))
        if done:
            q.stop()
            # partitions may still land while stop() drains the trigger
            return len(glob.glob(os.path.join(out_dir, "batch_id=*")))
        _t.sleep(0.05)
    q.stop()
    raise AssertionError("no output before timeout")


def test_stateful_checkpoint_restart_running_totals(spark, tmp_path):
    """Kill an applyInPandasWithState query mid-stream and restart it
    from the checkpoint: per-key state (cumulative counters) must
    survive the restart, so the final per-key totals equal the batch
    aggregate over ALL the data — not just the post-restart suffix.
    (The reference's eow/eos contract survives agent restarts —
    exec_node.h:213-223.)"""
    from pyspark.sql import functions as F

    from pixie_spark.streaming.ingest import _write_batch, read_accumulated
    from pixie_spark.streaming.stateful import running_totals

    df = spark.range(0, 600).select(
        (F.col("id") % 7).alias("user_id"),
        (F.col("id") * 1.5).alias("value"),
        (F.col("id") * 1_000_000).alias("time_"),
    )
    src = str(tmp_path / "src")
    df.repartitionByRange(6, "time_").sortWithinPartitions("time_").write.mode(
        "overwrite"
    ).parquet(src)
    expected = {
        r["user_id"]: (r["n_events"], r["total"], r["last_seen"])
        for r in running_totals(
            spark.read.schema(df.schema).parquet(src), "user_id", "value", "time_"
        ).collect()
    }

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def start():
        stream = (
            spark.readStream.schema(df.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        return (
            running_totals(stream, "user_id", "value", "time_")
            .writeStream.foreachBatch(lambda b, bid: _write_batch(b, out, bid))
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .start()
        )

    q1 = start()
    n_before = _kill_after_first_output(q1, out)
    assert n_before < 6, "kill landed after the stream already drained"

    q2 = start()  # resume from the SAME checkpoint
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()

    import glob

    assert len(glob.glob(os.path.join(out, "batch_id=*"))) == 6
    # final state = the LAST update per key (n_events is monotone)
    rows = read_accumulated(spark, out).collect()
    last = {}
    for r in rows:
        cur = last.get(r["user_id"])
        if cur is None or r["n_events"] > cur[0]:
            last[r["user_id"]] = (r["n_events"], r["total"], r["last_seen"])
    assert last == expected


def test_stateful_checkpoint_restart_anomalies(spark, tmp_path):
    """Kill/resume for the percentile-style stateful twin: the
    trailing-window anomaly state (per-entity baseline history) must
    survive a checkpoint restart, so the accumulated append output over
    both runs equals the batch computation — including a spike whose
    baseline was built entirely BEFORE the kill."""
    import numpy as np
    from pyspark.sql import types as T

    from pixie_spark.streaming.ingest import _write_batch, read_accumulated
    from pixie_spark.streaming.stateful import streaming_anomalies

    rng = np.random.default_rng(13)
    rows = []
    for e in ("svc-a", "svc-b"):
        vs = list(rng.normal(loc=10, scale=1, size=120))
        vs[100] = 40.0  # spike lands in the LAST micro-batch
        rows += [(e, t, float(v)) for t, v in enumerate(vs)]
    schema = T.StructType(
        [
            T.StructField("entity", T.StringType()),
            T.StructField("ts", T.LongType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    src = str(tmp_path / "a_src")
    for i, (lo, hi) in enumerate([(0, 30), (30, 60), (60, 90), (90, 120)]):
        part = [r for r in rows if lo <= r[1] < hi]
        spark.createDataFrame(part, schema).coalesce(1).write.mode(
            "append" if i else "overwrite"
        ).parquet(src)

    expected = {
        (r["entity"], r["ts"]): (
            r["baseline_n"],
            None if r["z"] is None else round(r["z"], 6),
            r["is_anomaly"],
        )
        for r in streaming_anomalies(spark.createDataFrame(rows, schema)).collect()
    }

    out, ckpt = str(tmp_path / "a_out"), str(tmp_path / "a_ckpt")

    def start():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        return (
            streaming_anomalies(stream)
            .writeStream.foreachBatch(lambda b, bid: _write_batch(b, out, bid))
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .start()
        )

    q1 = start()
    n_before = _kill_after_first_output(q1, out)
    assert n_before < 4, "kill landed after the stream already drained"
    q2 = start()
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()

    got = {
        (r["entity"], r["ts"]): (
            r["baseline_n"],
            None if r["z"] is None else round(r["z"], 6),
            r["is_anomaly"],
        )
        for r in read_accumulated(spark, out).collect()
    }
    assert got == expected
    # the planted spike (state built pre-kill) still flagged post-resume
    assert got[("svc-a", 100)][2] and got[("svc-b", 100)][2]


def test_ingest_batch_issues_no_guard_actions(spark, tmp_path, monkeypatch):
    """Round-5 review #7: the per-trigger ``take(1)`` empty-guard fired
    an extra job per micro-batch before build_index re-read the batch.
    The guard is gone — driver actions during one ingest step are now
    EXACTLY the two localCheckpoint materializations (entries +
    signatures) plus the three writes; no take/first/collect/count
    probes. Mirrors the action-count assert of tests/test_graph.py."""
    from pyspark.sql import types as T
    from pyspark.sql.classic.dataframe import DataFrame

    from pixie_spark.streaming.ingest import ingest_dedup_batch, line_dedup_batch

    calls = {"take": 0, "first": 0, "collect": 0, "count": 0, "ckpt": 0}
    orig = {
        "take": DataFrame.take, "first": DataFrame.first,
        "collect": DataFrame.collect, "count": DataFrame.count,
        "ckpt": DataFrame.localCheckpoint,
    }

    def wrap(name):
        def inner(self, *a, **k):
            calls[name] += 1
            return orig[name](self, *a, **k)
        return inner

    for name in ("take", "first", "collect", "count"):
        monkeypatch.setattr(DataFrame, name, wrap(name))
    monkeypatch.setattr(DataFrame, "localCheckpoint", wrap("ckpt"))

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    b = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta")], schema
    )
    ingest_dedup_batch(b, 0, str(tmp_path / "idx"), str(tmp_path / "pairs"), n=3)
    assert calls["take"] == calls["first"] == calls["collect"] == calls["count"] == 0
    # entries + signatures (eager, each feeding 2 consumers) plus the
    # LAZY plan-pinning checkpoint inside build_index (no job at call)
    assert calls["ckpt"] == 3

    calls.update({k: 0 for k in calls})
    line_dedup_batch(b, 0, str(tmp_path / "lidx"), str(tmp_path / "lout"))
    assert calls["take"] == calls["first"] == calls["collect"] == calls["count"] == 0
    assert calls["ckpt"] == 2  # occurrence rows + newly-owned lids


def test_streaming_ingest_dedup_kill_resume(spark, tmp_path):
    """Kill the ingestion-dedup stream after its first committed pairs
    partition, restart from the checkpoint, drain: the accumulated pair
    set must STILL equal a from-scratch rebuild over the whole prefix —
    the batch_id-partitioned writes make the replayed in-flight batch
    replace its partial output, and the batch_id < current read filter
    keeps the failed attempt out of the retry's index view."""
    from pyspark.sql import types as T

    import pixie_spark.streaming as S
    from pixie_spark.operators.dedup import minhash_lsh_pairs
    from pixie_spark.streaming.ingest import read_accumulated, streaming_ingest_dedup

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    mk = lambda i, extra: (i, f"{base} {extra} doc{i % 3}")  # noqa: E731
    rows = [mk(i, ["one", "two", "three", "four"][i % 4]) for i in range(1, 13)]
    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    src = str(tmp_path / "kr_src")
    chunks = [rows[i:i + 2] for i in range(0, len(rows), 2)]  # 6 micro-batches
    for idx, chunk in enumerate(chunks):
        spark.createDataFrame(chunk, schema).coalesce(1).write.mode(
            "append" if idx else "overwrite"
        ).parquet(src)

    idx_dir, pairs_dir = str(tmp_path / "kr_index"), str(tmp_path / "kr_pairs")
    ckpt = str(tmp_path / "kr_ckpt")

    def start():
        stream = S.stream_table(spark, src, schema, max_files_per_trigger=1)
        return streaming_ingest_dedup(
            stream, idx_dir, pairs_dir, n=3, num_hashes=64, bands=64, threshold=0.5,
        ).option("checkpointLocation", ckpt).start()

    q1 = start()
    n_before = _kill_after_first_output(q1, pairs_dir)
    assert n_before < 6, "kill landed after the stream already drained"
    q2 = start()  # resume from the same checkpoint
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()

    got = {
        frozenset((r["doc_a"], r["doc_b"])): round(r["est_jaccard"], 9)
        for r in read_accumulated(spark, pairs_dir).collect()
    }
    full = {
        frozenset((r["doc_a"], r["doc_b"])): round(r["est_jaccard"], 9)
        for r in minhash_lsh_pairs(
            spark.createDataFrame(rows, schema), "doc_id", "text",
            n=3, num_hashes=64, bands=64, threshold=0.5,
        ).collect()
    }
    assert got == full
    # index holds exactly one signature per ingested doc — no replay dups
    sigs = read_accumulated(spark, os.path.join(idx_dir, "signatures"))
    assert sigs.count() == len(rows)
    assert sigs.select("doc").distinct().count() == len(rows)


def test_streaming_line_dedup_kill_resume(spark, tmp_path):
    """Symmetric restart proof for the line-dedup loop: kill after the
    first committed output partition, resume from the checkpoint, and
    the accumulated output still equals the batch operator on the
    concatenation — with the lid index holding each line exactly once."""
    from pyspark.sql import types as T

    import pixie_spark.streaming as S
    from pixie_spark.operators.dedup import line_level_dedup
    from pixie_spark.streaming.ingest import read_accumulated, streaming_line_dedup

    rows = [
        (i, f"shared boilerplate line\nbody of document {i}\ncommon tail {i % 2}")
        for i in range(1, 13)
    ]
    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    src = str(tmp_path / "lkr_src")
    chunks = [rows[i:i + 2] for i in range(0, len(rows), 2)]  # 6 micro-batches
    for idx, chunk in enumerate(chunks):
        spark.createDataFrame(chunk, schema).coalesce(1).write.mode(
            "append" if idx else "overwrite"
        ).parquet(src)

    idx_dir, out_dir = str(tmp_path / "lkr_index"), str(tmp_path / "lkr_out")
    ckpt = str(tmp_path / "lkr_ckpt")

    def start():
        stream = S.stream_table(spark, src, schema, max_files_per_trigger=1)
        return streaming_line_dedup(stream, idx_dir, out_dir).option(
            "checkpointLocation", ckpt
        ).start()

    q1 = start()
    n_before = _kill_after_first_output(q1, out_dir)
    assert n_before < 6, "kill landed after the stream already drained"
    q2 = start()
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()

    got = {
        r["doc_id"]: r.asDict()
        for r in read_accumulated(spark, out_dir).collect()
    }
    exp = {
        r["doc_id"]: r.asDict()
        for r in line_level_dedup(spark.createDataFrame(rows, schema)).collect()
    }
    assert got == exp
    lids = read_accumulated(spark, os.path.join(idx_dir, "lids"))
    distinct_lines = {ln for _, t in rows for ln in t.split("\n")}
    assert lids.count() == len(distinct_lines)


def test_compact_batches_preserves_contract(spark, tmp_path):
    """compact_batches folds committed batch_id partitions into one
    without changing a row: (a) read_accumulated is identical before
    and after, (b) the directory count collapses, (c) ingestion CONTINUES
    against the compacted index — later batches still find cross-epoch
    near-dups and the accumulated pair set still equals a full rebuild."""
    import glob

    from pyspark.sql import types as T

    from pixie_spark.operators.dedup import minhash_lsh_pairs
    from pixie_spark.streaming.ingest import (
        compact_batches,
        ingest_dedup_batch,
        read_accumulated,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    mk = lambda i, extra: (i, f"{base} {extra} doc{i % 3}")  # noqa: E731
    rows = [mk(i, ["one", "two", "three", "four"][i % 4]) for i in range(1, 11)]
    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    idx, pairs = str(tmp_path / "c_index"), str(tmp_path / "c_pairs")
    kw = dict(n=3, num_hashes=64, bands=64, threshold=0.5)
    for b in range(4):  # batches 0..3, committed epoch
        df = spark.createDataFrame(rows[b * 2:(b + 1) * 2], schema)
        ingest_dedup_batch(df, b, idx, pairs, **kw)

    sig_path = os.path.join(idx, "signatures")
    before = sorted(map(str, read_accumulated(spark, sig_path).collect()))
    assert len(glob.glob(os.path.join(sig_path, "batch_id=*"))) == 4
    for sub in ("entries", "signatures"):
        folded = compact_batches(spark, os.path.join(idx, sub), upto_batch_id=3)
        assert folded == 4
    folded_pairs = compact_batches(spark, pairs, upto_batch_id=3)
    assert folded_pairs >= 1
    assert len(glob.glob(os.path.join(sig_path, "batch_id=*"))) == 1
    assert sorted(map(str, read_accumulated(spark, sig_path).collect())) == before

    # the loop continues against the compacted index: batches 4..5
    for b in range(4, 5):
        df = spark.createDataFrame(rows[b * 2:(b + 1) * 2], schema)
        ingest_dedup_batch(df, b, idx, pairs, **kw)
    got = {
        frozenset((r["doc_a"], r["doc_b"])): round(r["est_jaccard"], 9)
        for r in read_accumulated(spark, pairs).collect()
    }
    full = {
        frozenset((r["doc_a"], r["doc_b"])): round(r["est_jaccard"], 9)
        for r in minhash_lsh_pairs(
            spark.createDataFrame(rows, schema), "doc_id", "text",
            n=3, num_hashes=64, bands=64, threshold=0.5,
        ).collect()
    }
    assert got == full
    # a cross-epoch pair exists: doc 9/10's twin lives before the compaction
    assert any(max(k) >= 9 and min(k) <= 8 for k in got)


def _ingest_four_batches(spark, tmp_path, tag):
    """Shared fixture logic: 4 committed ingest batches → (idx, pairs,
    rows, kw) with batch_id= partitions under idx/{entries,signatures}."""
    from pyspark.sql import types as T

    from pixie_spark.streaming.ingest import ingest_dedup_batch

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    mk = lambda i, extra: (i, f"{base} {extra} doc{i % 3}")  # noqa: E731
    rows = [mk(i, ["one", "two", "three", "four"][i % 4]) for i in range(1, 11)]
    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    idx, pairs = str(tmp_path / f"{tag}_index"), str(tmp_path / f"{tag}_pairs")
    kw = dict(n=3, num_hashes=64, bands=64, threshold=0.5)
    for b in range(4):
        df = spark.createDataFrame(rows[b * 2:(b + 1) * 2], schema)
        ingest_dedup_batch(df, b, idx, pairs, **kw)
    return idx, pairs, rows, schema, kw


def test_compact_batches_crash_atomic(spark, tmp_path):
    """Round-6 verdict #1: kill compaction at EVERY intermediate point
    (after the consolidated fold, after the atomic swap, mid-cleanup)
    and prove no committed row is ever unreadable — then prove a plain
    re-run completes the interrupted compaction and the ingest loop
    continues correctly against the result."""
    import glob

    from pixie_spark.streaming.ingest import (
        compact_batches,
        ingest_dedup_batch,
        read_accumulated,
    )
    from pixie_spark.operators.dedup import minhash_lsh_pairs

    idx, pairs, rows, schema, kw = _ingest_four_batches(spark, tmp_path, "ca")
    sig_path = os.path.join(idx, "signatures")
    before = sorted(map(str, read_accumulated(spark, sig_path).collect()))

    class Boom(Exception):
        pass

    def failer(stage):
        calls = {"n": 0}

        def f(s):
            if s == stage and calls["n"] == 0:
                calls["n"] += 1
                raise Boom(stage)

        return f

    # crash BEFORE the swap: old layout untouched, temp invisible
    with pytest.raises(Boom):
        compact_batches(spark, sig_path, upto_batch_id=3, _failpoint=failer("pre-swap"))
    assert sorted(map(str, read_accumulated(spark, sig_path).collect())) == before
    assert len(glob.glob(os.path.join(sig_path, "batch_id=*"))) == 4

    # crash AFTER the rename but BEFORE the commit marker: the
    # generation directory exists but is UNMARKED — invisible to every
    # read (this is the window where an object-store copy+delete
    # "rename" can also leave a PARTIAL directory), sources intact
    with pytest.raises(Boom):
        compact_batches(spark, sig_path, upto_batch_id=3, _failpoint=failer("pre-mark"))
    assert len(glob.glob(os.path.join(sig_path, "batch_id=-*"))) == 1
    assert sorted(map(str, read_accumulated(spark, sig_path).collect())) == before

    # crash AFTER the commit marker, before any cleanup: new generation
    # already supersedes the still-present per-batch dirs — no dup, no
    # loss (the re-run below starts from this marked-generation state)
    with pytest.raises(Boom):
        compact_batches(spark, sig_path, upto_batch_id=3, _failpoint=failer("post-swap"))
    assert sorted(map(str, read_accumulated(spark, sig_path).collect())) == before

    # crash MID-cleanup: some superseded dirs deleted, some not
    with pytest.raises(Boom):
        compact_batches(spark, sig_path, upto_batch_id=3, _failpoint=failer("mid-cleanup"))
    assert sorted(map(str, read_accumulated(spark, sig_path).collect())) == before

    # plain re-run completes the interrupted compaction
    compact_batches(spark, sig_path, upto_batch_id=3)
    assert len(glob.glob(os.path.join(sig_path, "batch_id=*"))) == 1
    assert sorted(map(str, read_accumulated(spark, sig_path).collect())) == before
    # no temp residue
    assert not glob.glob(os.path.join(sig_path, ".batch_id-compact-*"))

    # the loop continues against a generation produced through a crash
    for sub in ("entries",):
        compact_batches(spark, os.path.join(idx, sub), upto_batch_id=3)
    df = spark.createDataFrame(rows[8:10], schema)
    ingest_dedup_batch(df, 4, idx, pairs, **kw)
    got = {
        frozenset((r["doc_a"], r["doc_b"])): round(r["est_jaccard"], 9)
        for r in read_accumulated(spark, pairs).collect()
    }
    full = {
        frozenset((r["doc_a"], r["doc_b"])): round(r["est_jaccard"], 9)
        for r in minhash_lsh_pairs(
            spark.createDataFrame(rows, schema), "doc_id", "text", **kw
        ).collect()
    }
    assert got == full


def test_compact_batches_partial_object_store_copy_invisible(spark, tmp_path):
    """On object stores the commit 'rename' is a per-object copy+delete:
    a crash mid-copy leaves a PARTIAL generation directory visible to
    directory listings. Such a directory carries no GEN_MARKER, so every
    read must ignore it (most-negative-id preference must NOT apply) and
    the next compact_batches run must sweep and rebuild it."""
    import glob

    from pixie_spark.streaming.ingest import (
        GEN_MARKER,
        compact_batches,
        read_accumulated,
    )

    idx, pairs, rows, schema, kw = _ingest_four_batches(spark, tmp_path, "po")
    sig_path = os.path.join(idx, "signatures")
    before = sorted(map(str, read_accumulated(spark, sig_path).collect()))

    # simulate the crashed copy: a generation dir holding only a SUBSET
    # of the consolidated rows (individual objects land whole) — no marker
    partial = os.path.join(sig_path, "batch_id=-4")
    (
        spark.read.parquet(sig_path)
        .where("batch_id = 0")
        .drop("batch_id")
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(partial)
    )
    for m in glob.glob(os.path.join(partial, "_SUCCESS")):
        os.remove(m)
    assert not os.path.exists(os.path.join(partial, GEN_MARKER))

    # invisible to reads: still the full pre-compaction content
    assert sorted(map(str, read_accumulated(spark, sig_path).collect())) == before

    # the next run sweeps the debris and commits a real generation
    compact_batches(spark, sig_path, upto_batch_id=3)
    gens = glob.glob(os.path.join(sig_path, "batch_id=-*"))
    assert [os.path.basename(g) for g in gens] == ["batch_id=-4"]
    assert os.path.exists(os.path.join(gens[0], GEN_MARKER))
    assert sorted(map(str, read_accumulated(spark, sig_path).collect())) == before


def test_compact_batches_legacy_generation_migration(spark, tmp_path):
    """Round-7 advice (medium): indexes compacted by the pre-GEN_MARKER
    code carry marker-less generations whose per-batch sources were
    already deleted — the marker-era reader must still see their rows
    (they are the only copy), and the next compact_batches run must
    ADOPT them (touch the marker in) instead of sweeping them."""
    import glob

    from pixie_spark.streaming.ingest import (
        GEN_MARKER,
        compact_batches,
        ingest_dedup_batch,
        read_accumulated,
    )

    idx, pairs, rows, schema, kw = _ingest_four_batches(spark, tmp_path, "lg")
    sig_path = os.path.join(idx, "signatures")
    before = sorted(map(str, read_accumulated(spark, sig_path).collect()))
    compact_batches(spark, sig_path, upto_batch_id=3)
    # simulate the legacy layout: committed generation, no marker,
    # sources already gone (exactly what the rename-only code left)
    marker = os.path.join(sig_path, "batch_id=-4", GEN_MARKER)
    os.remove(marker)

    # read side: the legacy generation is recognized as committed —
    # its rows (the only copy) stay visible
    assert sorted(map(str, read_accumulated(spark, sig_path).collect())) == before

    # the ingest loop continues against the legacy layout
    df = spark.createDataFrame(rows[8:10], schema)
    ingest_dedup_batch(df, 4, idx, pairs, **kw)
    assert len(read_accumulated(spark, sig_path).collect()) > len(before)

    # the next compaction ADOPTS the legacy generation (marker touched,
    # nothing deleted) and folds it forward like any committed one
    compact_batches(spark, os.path.join(idx, "entries"), upto_batch_id=4)
    compact_batches(spark, sig_path, upto_batch_id=4)
    gens = glob.glob(os.path.join(sig_path, "batch_id=-*"))
    assert [os.path.basename(g) for g in gens] == ["batch_id=-5"]
    assert os.path.exists(os.path.join(gens[0], GEN_MARKER))
    got = sorted(map(str, read_accumulated(spark, sig_path).collect()))
    assert set(before) <= set(got)


def test_compact_batches_unmarked_gen_with_sources_still_swept(spark, tmp_path):
    """The legacy recognition must NOT weaken crash safety: a marker-less
    generation whose covered sources (per-batch dirs or an older
    generation) still exist is a marker-era pre-mark crash — possibly a
    partial object-store copy — and must stay invisible and be swept,
    exactly as before the migration guard."""
    import glob

    from pixie_spark.streaming.ingest import (
        GEN_MARKER,
        compact_batches,
        read_accumulated,
    )

    idx, pairs, rows, schema, kw = _ingest_four_batches(spark, tmp_path, "lc")
    sig_path = os.path.join(idx, "signatures")
    compact_batches(spark, sig_path, upto_batch_id=1)  # marked gen -2
    before = sorted(map(str, read_accumulated(spark, sig_path).collect()))

    # fake a crashed recompaction: unmarked gen -5 (covers 0..4) while
    # batches 2..3 and the marked gen -2 are still on disk
    partial = os.path.join(sig_path, "batch_id=-5")
    (
        spark.read.parquet(sig_path).where("batch_id = 2").drop("batch_id")
        .coalesce(1).write.mode("overwrite").parquet(partial)
    )
    for m in glob.glob(os.path.join(partial, "_SUCCESS")):
        os.remove(m)
    assert not os.path.exists(os.path.join(partial, GEN_MARKER))

    # invisible to reads (NOT adopted: its sources are still present)
    assert sorted(map(str, read_accumulated(spark, sig_path).collect())) == before
    # swept and rebuilt by the next run
    compact_batches(spark, sig_path, upto_batch_id=3)
    gens = sorted(
        os.path.basename(g) for g in glob.glob(os.path.join(sig_path, "batch_id=-*"))
    )
    assert gens == ["batch_id=-4"]
    assert os.path.exists(os.path.join(sig_path, "batch_id=-4", GEN_MARKER))
    assert sorted(map(str, read_accumulated(spark, sig_path).collect())) == before


def test_compact_batches_ambiguous_unmarked_gen_quarantined(spark, tmp_path):
    """Round-8 advice (low): the residual-ambiguity layout — unmarked
    generation whose covered per-batch sources are PARTIALLY gone
    (a legacy compaction that crashed mid-cleanup) — may hold the only
    copy of the deleted batches' rows. The sweep must QUARANTINE it
    (dot-prefixed, invisible, recoverable) instead of hard-deleting."""
    import glob

    from pixie_spark.streaming.ingest import (
        GEN_MARKER,
        compact_batches,
        read_accumulated,
    )

    idx, pairs, rows, schema, kw = _ingest_four_batches(spark, tmp_path, "qa")
    sig_path = os.path.join(idx, "signatures")
    batch2 = sorted(
        map(str, spark.read.parquet(sig_path).where("batch_id = 2")
            .drop("batch_id").collect())
    )

    # simulate the legacy mid-cleanup crash: gen -4 committed by its
    # rename (no marker), batch 2's source already deleted, 0/1/3 not yet
    partial = os.path.join(sig_path, "batch_id=-4")
    (
        spark.read.parquet(sig_path).where("batch_id <= 3").drop("batch_id")
        .coalesce(1).write.mode("overwrite").parquet(partial)
    )
    for m in glob.glob(os.path.join(partial, "_SUCCESS")):
        os.remove(m)
    assert not os.path.exists(os.path.join(partial, GEN_MARKER))
    shutil.rmtree(os.path.join(sig_path, "batch_id=2"))

    # invisible to reads: only the surviving per-batch sources
    survivors = sorted(
        map(str, spark.read.parquet(sig_path)
            .where("batch_id in (0, 1, 3)").drop("batch_id").collect())
    )
    assert sorted(map(str, read_accumulated(spark, sig_path).collect())) == survivors

    # the sweep QUARANTINES (not deletes) and rebuilds from survivors
    compact_batches(spark, sig_path, upto_batch_id=3)
    q = glob.glob(os.path.join(sig_path, ".quarantine-batch_id=-4*"))
    assert len(q) == 1
    # the quarantined rows (incl. batch 2's only copy) are intact
    qrows = sorted(map(str, spark.read.parquet(q[0]).collect()))
    assert set(batch2) <= set(qrows)
    gens = glob.glob(os.path.join(sig_path, "batch_id=-*"))
    assert [os.path.basename(g) for g in gens] == ["batch_id=-4"]
    assert os.path.exists(os.path.join(gens[0], GEN_MARKER))
    assert sorted(map(str, read_accumulated(spark, sig_path).collect())) == survivors

    # a SECOND ambiguous layout quarantines alongside the first
    # (uniquified target — rename must not nest into the existing dir)
    partial2 = os.path.join(sig_path, "batch_id=-6")
    (
        spark.read.parquet(sig_path).where("batch_id = -4").drop("batch_id")
        .coalesce(1).write.mode("overwrite").parquet(partial2)
    )
    for m in glob.glob(os.path.join(partial2, "_SUCCESS")):
        os.remove(m)
    compact_batches(spark, sig_path, upto_batch_id=3)
    # covered batches 4..5 have no source anywhere -> ambiguous again
    assert glob.glob(os.path.join(sig_path, ".quarantine-batch_id=-6*"))
    assert sorted(map(str, read_accumulated(spark, sig_path).collect())) == survivors


def test_compact_batches_stale_foreign_tmp_swept(spark, tmp_path):
    """Round-7 advice (low): a tmp directory stranded by a crashed run
    with a DIFFERENT upto_batch_id must be deleted by any later run's
    sweep — tmps are by construction uncommitted."""
    import glob

    from pixie_spark.streaming.ingest import compact_batches, read_accumulated

    idx, pairs, rows, schema, kw = _ingest_four_batches(spark, tmp_path, "tm")
    sig_path = os.path.join(idx, "signatures")
    before = sorted(map(str, read_accumulated(spark, sig_path).collect()))
    stale = os.path.join(sig_path, ".batch_id-compact-1.tmp")
    (
        spark.read.parquet(sig_path).where("batch_id = 0").drop("batch_id")
        .coalesce(1).write.mode("overwrite").parquet(stale)
    )
    compact_batches(spark, sig_path, upto_batch_id=3)  # different upto
    assert not glob.glob(os.path.join(sig_path, ".batch_id-compact-*"))
    assert sorted(map(str, read_accumulated(spark, sig_path).collect())) == before


def test_compact_batches_recompaction_generations(spark, tmp_path):
    """Compacting an ALREADY-compacted index folds the old generation
    plus the new per-batch dirs into the next generation — and a crash
    between the two generations being on disk simultaneously still
    reads exactly one copy of every row (newest generation wins)."""
    import glob

    from pixie_spark.streaming.ingest import (
        compact_batches,
        ingest_dedup_batch,
        read_accumulated,
    )

    idx, pairs, rows, schema, kw = _ingest_four_batches(spark, tmp_path, "gen")
    sig_path = os.path.join(idx, "signatures")
    compact_batches(spark, sig_path, upto_batch_id=1)  # gen 1 covers 0..1
    df = spark.createDataFrame(rows[8:10], schema)
    ingest_dedup_batch(df, 4, idx, pairs, **kw)
    before = sorted(map(str, read_accumulated(spark, sig_path).collect()))

    class Boom(Exception):
        pass

    def post_swap(stage):
        if stage == "post-swap":
            raise Boom(stage)

    with pytest.raises(Boom):
        compact_batches(spark, sig_path, upto_batch_id=4, _failpoint=post_swap)
    # both generations + superseded dirs on disk: still exactly-once
    assert sorted(map(str, read_accumulated(spark, sig_path).collect())) == before
    compact_batches(spark, sig_path, upto_batch_id=4)
    assert len(glob.glob(os.path.join(sig_path, "batch_id=*"))) == 1
    assert sorted(map(str, read_accumulated(spark, sig_path).collect())) == before
    # folding a SHORTER prefix than already covered refuses loudly
    with pytest.raises(ValueError, match="already compacted"):
        compact_batches(spark, sig_path, upto_batch_id=2)


def test_compact_batches_replay_guard_fails_loud(spark, tmp_path):
    """If compaction ever folds a batch that is then replayed (the
    offsets-logged-but-uncommitted case), the per-batch index read must
    FAIL LOUDLY instead of silently feeding the retry its own first
    attempt — the round-6 medium-severity advice item."""
    from pyspark.sql import types as T

    from pixie_spark.streaming.ingest import (
        _read_before,
        compact_batches,
        ingest_dedup_batch,
    )

    idx, pairs, rows, schema, kw = _ingest_four_batches(spark, tmp_path, "rg")
    sig_path = os.path.join(idx, "signatures")
    compact_batches(spark, sig_path, upto_batch_id=3)
    like = spark.createDataFrame([], "doc long")
    # batches 0..3 folded; a replay of batch 3 must not see generation -4
    with pytest.raises(RuntimeError, match="compacted"):
        _read_before(spark, sig_path, 3, like)
    # ...and the full ingest step surfaces the same error
    with pytest.raises(RuntimeError, match="compacted"):
        ingest_dedup_batch(
            spark.createDataFrame(rows[6:8], schema), 3, idx, pairs, **kw
        )
    # batch 4 (first un-folded id) reads cleanly
    assert _read_before(spark, sig_path, 4, like).count() == 8


def test_compact_batches_commit_log_guard_live_stream(spark, tmp_path):
    """checkpoint_dir-guarded compaction against a REAL streaming
    checkpoint: folding past the commits log raises; compaction invoked
    BETWEEN two live micro-batches (from inside the foreachBatch of the
    later one, guarded by the commit log) is safe and the accumulated
    output still equals the input."""
    import glob

    from pyspark.sql import types as T

    from pixie_spark.streaming.ingest import (
        _last_committed_batch,
        _write_batch,
        compact_batches,
        read_accumulated,
    )

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    rows = [(i, f"document body {i}") for i in range(12)]
    src = str(tmp_path / "clg_src")
    for i in range(6):
        spark.createDataFrame(rows[i * 2:(i + 1) * 2], schema).coalesce(1).write.mode(
            "append" if i else "overwrite"
        ).parquet(src)
    out, ckpt = str(tmp_path / "clg_out"), str(tmp_path / "clg_ckpt")
    compactions = []

    def sink(batch_df, batch_id):
        _write_batch(batch_df, out, batch_id)
        last = _last_committed_batch(spark, ckpt)
        if batch_id == 4 and last is not None:
            # live compaction between micro-batches, commit-log guarded
            compactions.append(compact_batches(
                spark, out, upto_batch_id=last, checkpoint_dir=ckpt
            ))

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    assert compactions and compactions[0] >= 2
    got = sorted((r["doc_id"], r["text"]) for r in read_accumulated(spark, out).collect())
    assert got == sorted(rows)

    last = _last_committed_batch(spark, ckpt)
    assert last == 5
    # folding PAST the commits log refuses loudly
    with pytest.raises(ValueError, match="last committed"):
        compact_batches(spark, out, upto_batch_id=last + 1, checkpoint_dir=ckpt)
    # folding a committed prefix is accepted and preserves every row
    compact_batches(spark, out, upto_batch_id=last, checkpoint_dir=ckpt)
    assert len(glob.glob(os.path.join(out, "batch_id=*"))) == 1
    got2 = sorted((r["doc_id"], r["text"]) for r in read_accumulated(spark, out).collect())
    assert got2 == sorted(rows)
    # an empty/fresh checkpoint commits nothing — guard refuses any fold
    with pytest.raises(ValueError, match="last committed"):
        compact_batches(
            spark, out, upto_batch_id=0, checkpoint_dir=str(tmp_path / "clg_none")
        )


def test_write_batch_rejects_reserved_column(spark, tmp_path):
    """A stream whose data legitimately carries a batch_id column must
    be rejected, not silently overwritten-then-dropped (round-6 advice,
    ingest.py _write_batch)."""
    from pixie_spark.streaming.ingest import _write_batch

    df = spark.range(3).select(F.col("id"), F.lit(7).alias("batch_id"))
    with pytest.raises(ValueError, match="batch_id"):
        _write_batch(df, str(tmp_path / "rsv"), 0)


def test_ingest_fs_helpers_are_object_store_shaped(spark, tmp_path):
    """The ingest module's directory I/O goes through the Hadoop
    FileSystem API: scheme-qualified file: URIs work end-to-end
    (proving no glob/shutil/os.path dependence), and an object-store
    scheme without its connector refuses with an actionable error
    instead of silently no-op'ing."""
    import glob

    from pixie_spark.streaming.ingest import (
        _fs_for,
        _list_batch_ids,
        compact_batches,
        read_accumulated,
    )

    idx, pairs, rows, schema, kw = _ingest_four_batches(spark, tmp_path, "fs")
    sig_path = os.path.join(idx, "signatures")
    uri = "file:" + sig_path
    assert _list_batch_ids(spark, uri) == [0, 1, 2, 3]
    before = sorted(map(str, read_accumulated(spark, uri).collect()))
    # full compaction cycle through the scheme-qualified URI
    assert compact_batches(spark, uri, upto_batch_id=3) == 4
    assert _list_batch_ids(spark, uri) == [-4]
    assert len(glob.glob(os.path.join(sig_path, "batch_id=*"))) == 1
    assert sorted(map(str, read_accumulated(spark, uri).collect())) == before
    # missing path → empty listing, not an exception
    assert _list_batch_ids(spark, "file:" + str(tmp_path / "nope")) == []
    # s3a without hadoop-aws on the classpath: actionable refusal
    with pytest.raises(RuntimeError, match="connector"):
        _fs_for(spark, "s3a://bucket/prefix")


def test_script_stream_relays_source_on_missing_success_marker(spark, tmp_path):
    """Round-6 advice (script_stream.py): source-layout reuse on
    restart is keyed on the _SUCCESS job-commit marker. A partial
    layout (part files present, no _SUCCESS — the crash-mid-layout
    state) must be RE-LAID, not streamed truncated."""
    from pyspark.sql import types as T

    import pixie_spark.api as px
    from pixie_spark.streaming.script_stream import StreamingScriptRun

    schema = T.StructType(
        [
            T.StructField("time_", T.LongType()),
            T.StructField("v", T.LongType()),
        ]
    )
    df = spark.createDataFrame([(i * 1_000_000, i) for i in range(20)], schema)
    work = str(tmp_path / "ssw")
    src = os.path.join(work, "src", "t")
    # fake a crash-mid-layout: ONE truncated part file, no _SUCCESS
    os.makedirs(src)
    df.limit(3).coalesce(1).write.mode("overwrite").parquet(src + ".tmp")
    import shutil

    part = [f for f in os.listdir(src + ".tmp") if f.startswith("part-")][0]
    shutil.copy(os.path.join(src + ".tmp", part), os.path.join(src, part))
    assert not os.path.exists(os.path.join(src, "_SUCCESS"))

    px.set_context(spark)
    script = "import px\ndf = px.DataFrame('t')\npx.display(df, 'out')\n"
    run = StreamingScriptRun(
        spark, script, stream_tables={"t": df}, static_tables={},
        work_dir=work, chunks=2,
    )
    try:
        run.await_drained()
    finally:
        run.stop()
    # all 20 rows streamed — the truncated 3-row layout was replaced
    assert len(run.results["out"]) == 20


def test_ingest_read_paths_partition_prune(spark, tmp_path):
    """The compaction-aware read predicates stay PARTITION filters: a
    month of 1-minute triggers is 43k batch_id= directories, and both
    the per-batch index view and read_accumulated must prune them at
    the FileIndex (never scan-and-filter) — including the sentinel-
    generation disjunct. Asserted on the executed plan's
    PartitionFilters, the same contract tests/test_layout.py pins for
    the time-partitioned sink."""
    import re

    from pixie_spark.streaming.ingest import (
        _read_before,
        _write_batch,
        compact_batches,
        read_accumulated,
    )

    d = str(tmp_path / "prune_idx")
    for b in range(4):
        _write_batch(spark.range(b * 10, b * 10 + 10).selectExpr("id AS doc"), d, b)
    compact_batches(spark, d, upto_batch_id=1)

    def pfilters(df):
        plan = df._jdf.queryExecution().executedPlan().toString()
        m = re.search(r"PartitionFilters: \[[^\]]*\]", plan)
        return m.group(0) if m else ""

    like = spark.createDataFrame([], "doc long")
    pf = pfilters(_read_before(spark, d, 3, like))
    assert "batch_id" in pf and "> 1" in pf and "< 3" in pf and "= -2" in pf, pf
    pf2 = pfilters(read_accumulated(spark, d))
    assert "batch_id" in pf2 and "> 1" in pf2 and "= -2" in pf2, pf2
    # and the pruned read is still exactly the committed prefix
    assert sorted(r.doc for r in _read_before(spark, d, 3, like).collect()) == list(range(30))
