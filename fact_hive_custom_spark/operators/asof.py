"""As-of join — Spark has no native operator (SURVEY.md §2.2.C, §7.3a).

Strategy: the *union-window* composition. Tag both sides, UNION ALL,
then one window pass per group key ordered by (ts, tiebreak) carrying
the most recent right-side value forward with
``last(..., ignoreNulls=True)``; left rows then read the carried
value. Cost: one shuffle on the group key + one sort — the same cost
profile as a sort-merge join, with NO n×m row explosion, so it scales
to 100 TB the way a naive "self-join then max_by" would not.

Alternative rejected: per-group ``applyInPandas`` + ``pd.merge_asof``
— correct, but moves every row through Arrow into Python; the
union-window plan stays entirely inside whole-stage codegen.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    by: Sequence[str],
    ts: str,
    tiebreak: str,
    carry: Sequence[str],
    strict: bool = True,
) -> DataFrame:
    """For each left row, attach the latest right row with right.ts <= / < left.ts.

    `by`: equality keys present in both sides; `ts`: ordering column
    (same name both sides); `tiebreak`: unique column making the order
    total; `carry`: right-side columns to attach (returned as
    `asof_<name>`). `strict=True` means strictly-preceding (<).
    Left columns are all preserved.
    """
    lcols = left.columns
    tagged_l = left.select(*lcols).withColumn("__side", F.lit(1))
    # Right side contributes only keys + ordering + carried payload.
    tagged_r = (
        right.select(
            *by,
            ts,
            tiebreak,
            *[F.col(c).alias(f"__carry_{c}") for c in carry],
        ).withColumn("__side", F.lit(0))
    )
    unioned = tagged_l.unionByName(tagged_r, allowMissingColumns=True)

    # Right rows sort before left rows at the same (ts, tiebreak) when
    # strict=False (value visible at its own instant); after when strict.
    side_order: Column = F.col("__side").asc() if not strict else F.col("__side").desc()
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(ts).asc(), side_order, F.col(tiebreak).asc())
        .rowsBetween(Window.unboundedPreceding, -1 if strict else 0)
    )
    carried = [
        F.last(F.col(f"__carry_{c}"), ignorenulls=True).over(w).alias(f"asof_{c}") for c in carry
    ]
    out = unioned.select("*", *carried).filter(F.col("__side") == 1)
    return out.select(*lcols, *[f"asof_{c}" for c in carry])
