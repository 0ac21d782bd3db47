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

from pyspark.sql import DataFrame, Window
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
    end_version_col: str | None = None,
) -> DataFrame:
    """Slowly-changing-dimension type 2 with real version semantics:

    - only updates whose `version_col` is STRICTLY newer than the key's
      current row apply (stale/duplicate CDC events are dropped — the
      idempotent-replay property a CDC consumer needs);
    - with several updates per key in one batch, only the latest-version
      one becomes the new current row;
    - closed rows flip `current_col` to false and, when
      `end_version_col` is given, are stamped with the superseding
      version (the "closed out with an end-version" contract);
    - history rows and untouched keys pass through unchanged.

    One shuffle of each side on the key; the per-key max-version
    aggregate is map-side partial.
    """
    k = list(key)
    # Latest update per key (deterministic: highest version wins).
    latest = (
        updates.withColumn(
            "__rn",
            F.row_number().over(Window.partitionBy(*k).orderBy(F.desc(version_col))),
        )
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )

    new_v = latest.select(*k, F.col(version_col).alias("__new_v"))
    cur = target.filter(F.col(current_col))
    hist = target.filter(~F.col(current_col))

    cur_j = cur.join(new_v, k, "left")
    superseded = F.col("__new_v").isNotNull() & (F.col("__new_v") > F.col(version_col))
    closed = cur_j.filter(superseded).withColumn(current_col, F.lit(False))
    still_current = cur_j.filter(~superseded)

    # Updates apply only against a strictly older (or absent) current row.
    cur_v = cur.select(*k, F.col(version_col).alias("__cur_v"))
    fresh = (
        latest.join(cur_v, k, "left")
        .filter(F.col("__cur_v").isNull() | (F.col(version_col) > F.col("__cur_v")))
        .drop("__cur_v")
        .withColumn(current_col, F.lit(True))
    )

    if end_version_col is not None:
        # Stamp ONLY the rows closed in this batch. When the target
        # already carries the column (every batch after the first),
        # history and still-current rows keep their existing values —
        # overwriting them with NULL would wipe prior end-version stamps
        # on each chained apply.
        closed = closed.withColumn(end_version_col, F.col("__new_v"))
        null_v = F.lit(None).cast(closed.schema[end_version_col].dataType)
        if end_version_col not in target.columns:
            still_current = still_current.withColumn(end_version_col, null_v)
            hist = hist.withColumn(end_version_col, null_v)
        # A new current row has no end version yet (withColumn also
        # overwrites a stale value if the updates feed carried one).
        fresh = fresh.withColumn(end_version_col, null_v)

    closed = closed.drop("__new_v")
    still_current = still_current.drop("__new_v")
    return still_current.unionByName(closed).unionByName(hist).unionByName(fresh)


def cdc_latest(
    state: DataFrame | None,
    batch: DataFrame,
    key: Sequence[str],
    order_by: Sequence[str],
) -> DataFrame:
    """Last-writer-wins CDC apply: one row per key survives, the max by
    `order_by` across existing state and the incoming batch.

    Unlike plain `upsert` (updates always win), a batch row only
    replaces state if it is strictly newer in the `order_by` total
    order — so replaying late/out-of-order CDC events can never
    regress the state table. One shuffle on the key; state stays one
    row per key by induction.
    """
    w = Window.partitionBy(*key).orderBy(*[F.desc(c) for c in order_by])
    cand = state.unionByName(batch) if state is not None else batch
    return (
        cand.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
