"""Lineage-truncating materialization with a durability switch.

Every shared intermediate this engine materializes (PQ quantized
corpus, graph edge lists, theta sketch segments, iterative
centroids/frontiers) uses `localCheckpoint()` — eager, executor-local
block storage, freed on RDD GC. That is the right local/bench default
(no distributed filesystem round-trip), but executor-LOCAL means an
executor loss on a real cluster kills every query whose lineage was
truncated into its blocks: the data has no replica and no recompute
path (r15 verdict item 6 — previously only a code comment).

`materialize(df)` keeps the localCheckpoint default and promotes the
cluster posture to a session-level switch:

    FHC_RELIABLE_CHECKPOINT=1  -> df.checkpoint() into a REAL
    checkpoint directory (set once per context from
    $FHC_CHECKPOINT_DIR, default <cwd>/spark-warehouse/_checkpoints;
    on a cluster point it at HDFS/object storage, where the write is
    replicated and any executor can re-read it).

Both forms are eager and truncate lineage identically — plan shape,
job structure and results are unchanged; only the storage of the
materialized blocks differs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def _reliable() -> bool:
    return os.environ.get("FHC_RELIABLE_CHECKPOINT", "0") == "1"


def materialize(df: DataFrame) -> DataFrame:
    """Eagerly materialize `df` and truncate its lineage.

    localCheckpoint by default; reliable `checkpoint()` when
    FHC_RELIABLE_CHECKPOINT=1 (see module docstring).
    """
    if not _reliable():
        return df.localCheckpoint()
    sc = df.sparkSession.sparkContext
    if sc._jsc.sc().getCheckpointDir().isEmpty():
        sc.setCheckpointDir(
            os.environ.get(
                "FHC_CHECKPOINT_DIR",
                os.path.join(os.getcwd(), "spark-warehouse", "_checkpoints"),
            )
        )
    return df.checkpoint(eager=True)
