"""Shared materialization point — the cluster-mode switch for every
``localCheckpoint`` in the package.

Iterative operators (connected components, PageRank, the rollup
cascade) and multi-consumer plans (a frame feeding both a count and a
join) need a point where the plan is cut: lineage truncated so
iteration N's plan does not nest N-1 plans, and the rows pinned so two
consumers observe the SAME evaluation (a non-deterministic source must
not diverge between them — see ivf_index_search, shard assignment).

``DataFrame.localCheckpoint`` is the right tool in local[] mode (one
JVM, block-manager storage, no recovery story needed) but is a known
local-mode artifact at cluster scale: the checkpointed blocks live only
in executor storage, so ONE lost executor aborts a multi-hour job
(SCALE.md "Materialization strategy"). This module makes the strategy a
session config instead of a hard-coded call:

``spark.pixie_spark.materialize`` (default ``localCheckpoint``):

- ``localCheckpoint`` — fastest; local mode / fault-tolerance-free
  clusters. Truncates lineage. Executor loss = job failure.
- ``persist`` — ``persist(StorageLevel.DISK_ONLY)`` + an eager count.
  Cluster-safe (executor loss recomputes from lineage); does NOT
  truncate lineage, so sites that REQUIRE truncation (corrupt-record
  scans, unbounded iteration) escalate per ``require_truncation``.
  Recompute-under-failure re-evaluates the source, so a genuinely
  non-deterministic input can diverge after an executor loss — the
  strategies below close that too.
- ``checkpoint`` — reliable ``DataFrame.checkpoint()`` against
  ``spark.pixie_spark.checkpointDir`` (point it at HDFS/S3 on a real
  cluster). Truncates lineage AND survives executor loss; the strategy
  a 1000-executor 100 TB run should pick.

The env var ``SPARK_GRAFT_MATERIALIZE`` seeds the config through
``pixie_spark.session.get_spark`` so the whole test/bench matrix can be
re-run under each strategy without code changes.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

CONF_STRATEGY = "spark.pixie_spark.materialize"
CONF_CKPT_DIR = "spark.pixie_spark.checkpointDir"
_STRATEGIES = ("localCheckpoint", "persist", "checkpoint")


def _strategy(df: DataFrame) -> str:
    mode = df.sparkSession.conf.get(
        CONF_STRATEGY, os.environ.get("SPARK_GRAFT_MATERIALIZE", "localCheckpoint")
    )
    if mode not in _STRATEGIES:
        raise ValueError(
            f"{CONF_STRATEGY}={mode!r}: expected one of {_STRATEGIES}"
        )
    return mode


def _ensure_checkpoint_dir(df: DataFrame) -> None:
    sc = df.sparkSession.sparkContext
    if sc._jsc.sc().getCheckpointDir().isEmpty():
        default = os.path.join(tempfile.gettempdir(), "pixie_spark_checkpoints")
        sc.setCheckpointDir(
            df.sparkSession.conf.get(
                CONF_CKPT_DIR, os.environ.get("SPARK_GRAFT_CHECKPOINT_DIR", default)
            )
        )


def materialize(
    df: DataFrame,
    eager: bool = True,
    require_truncation: bool = False,
    release: DataFrame | None = None,
) -> DataFrame:
    """Cut the plan here, under the session's configured strategy.

    ``eager`` — evaluate now (default). ``eager=False`` only marks the
    cut; the first downstream action pays for it (used where the caller
    knows a single action follows immediately, e.g. the rollup
    cascade's next level).

    ``require_truncation`` — the call site is semantically broken
    without lineage truncation (corrupt-record-only scans, which Spark
    refuses to analyze against the raw source; iteration whose plan
    would otherwise nest unboundedly). Under the ``persist`` strategy —
    which cannot truncate — such sites escalate to a reliable
    checkpoint, keeping the strategy's cluster-safety rather than
    silently degrading to localCheckpoint.

    ``release`` — a PREVIOUS materialization this cut supersedes
    (iterative operators pass the last round's frame). Unpersisted
    AFTER the new cut is eagerly evaluated, so under the persist
    strategy a 20-round loop holds 2 cached copies, not 20;
    localCheckpoint blocks and reliable-checkpoint files are reclaimed
    by Spark's ContextCleaner once unreferenced (session.py enables
    cleanCheckpoints), and the explicit unpersist is a safe no-op for
    them. Only honored when ``eager`` — releasing before a lazy cut
    evaluates would force a recompute of the frame being released.
    """
    mode = _strategy(df)
    if mode == "persist" and require_truncation:
        mode = "checkpoint"
    if mode == "localCheckpoint":
        out = df.localCheckpoint(eager=eager)
    elif mode == "checkpoint":
        _ensure_checkpoint_dir(df)
        out = df.checkpoint(eager=eager)
    else:
        out = df.persist(StorageLevel.DISK_ONLY)
        if eager:
            out.count()
    if release is not None and eager:
        try:
            release.unpersist()
        except Exception:
            pass  # a non-persisted frame has nothing to release
    return out
