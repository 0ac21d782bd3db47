"""Upsert / MERGE-INTO emulation (CDC pattern).

Plain Spark has no transactional MERGE (that's Delta/Iceberg's ACID
layer); the relational core — new version of every matched key, old
version of every unmatched key — is an anti-join + union:

    merged = updates ∪ (target ⟕anti updates on key)

Cost at 100 TB: one shuffle of each side on the key (or zero if both
are bucketed on it), no row explosion. With a lakehouse format the
same plan runs under a transaction; rewriting only touched files.
SCD2 (`scd2_close`) keeps history instead of overwriting: matched
current rows get closed out with an end-version, updates append as the
new current version.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def upsert(target: DataFrame, updates: DataFrame, key: Sequence[str]) -> DataFrame:
    """MERGE semantics: updates win on key collision, unmatched target
    rows survive. Columns must match by name."""
    keep = target.join(updates.select(*key), list(key), "left_anti")
    return keep.unionByName(updates)


def scd2_close(
    target: DataFrame,
    updates: DataFrame,
    key: Sequence[str],
    version_col: str,
    current_col: str = "is_current",
) -> DataFrame:
    """Slowly-changing-dimension type 2: matched current rows are closed
    (is_current=false), update rows append as the new current version.
    `version_col` must be monotonically increasing per key."""
    upd_keys = updates.select(*key)
    closed = (
        target.join(F.broadcast(upd_keys.distinct()), list(key), "left_semi")
        .filter(F.col(current_col))
        .withColumn(current_col, F.lit(False))
    )
    untouched_current = target.join(upd_keys, list(key), "left_anti")
    history = target.filter(~F.col(current_col)).join(
        upd_keys.distinct(), list(key), "left_semi"
    )
    fresh = updates.withColumn(current_col, F.lit(True))
    return untouched_current.unionByName(closed).unionByName(history).unionByName(fresh)
