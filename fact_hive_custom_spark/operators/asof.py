"""As-of join — Spark has no native operator (SURVEY.md §2.2.C, §7.3a).

Strategy: the *union-window* composition. Tag both sides, UNION ALL,
then one window pass per group key ordered by (ts, side, tiebreak)
carrying the adjacent right-side value with ``last(..., ignoreNulls)``
(backward) or ``first(..., ignoreNulls)`` (forward); left rows then
read the carried value. Cost: one shuffle on the group key + one sort —
the same cost profile as a sort-merge join, with NO n×m row explosion,
so it scales to 100 TB the way a naive "self-join then max_by" would
not. ``nearest`` composes the two directional passes (two shuffles on
the same key) and picks the closer side, ties to backward — the
pandas ``merge_asof(direction="nearest")`` contract.

Alternative rejected: per-group ``applyInPandas`` + ``pd.merge_asof``
— correct, but moves every row through Arrow into Python; the
union-window plan stays entirely inside whole-stage codegen.

Same-instant semantics (`strict`): the side ordering places right rows
before/after left rows at an equal (ts) so that a ROWS frame excludes
(strict) or includes (non-strict) the right row at the left row's own
instant — no range frame or extra filter needed.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _asof_directional(
    left: DataFrame,
    right: DataFrame,
    by: Sequence[str],
    ts: str,
    tiebreak: str,
    carry: Sequence[str],
    strict: bool,
    forward: bool,
    prefix: str,
) -> DataFrame:
    """Union-window pass in one direction; carried columns get `prefix`."""
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

    # Side ordering at an equal ts decides same-instant visibility under
    # a ROWS frame (see module docstring). Backward: frame ends at the
    # current row (or -1 when strict, with rights sorted after lefts);
    # forward is the exact mirror.
    # Both directions run as a RUNNING [UNBOUNDED PRECEDING, current-1|0]
    # frame: forward traverses the REVERSED total order instead of using
    # a [current, UNBOUNDED FOLLOWING] frame — Spark evaluates the
    # following-frame first_value by re-scanning the partition tail per
    # row, O(run²) in the gap between right rows (measured 62 s vs 11 s
    # per column on a 10.5 M-row grid — the round-12 q_ts_gapfill
    # finding; at 100 TB a single by-key's series makes the quadratic
    # fatal). "First right at-or-after in ascending order" IS "last
    # right at-or-before in descending order" when every sort key is
    # mirrored, so the reversed pass is semantically identical.
    side_order: Column
    if forward:
        # mirror of the backward order: ts desc, side mirrored, tiebreak
        # desc; at an equal ts the side that sorted AFTER lefts ascending
        # must sort BEFORE them descending (and vice versa).
        side_order = F.col("__side").desc() if strict else F.col("__side").asc()
        order = [F.col(ts).desc(), side_order, F.col(tiebreak).desc()]
    else:
        side_order = F.col("__side").desc() if strict else F.col("__side").asc()
        order = [F.col(ts).asc(), side_order, F.col(tiebreak).asc()]
    frame = (Window.unboundedPreceding, -1 if strict else 0)
    pick = F.last
    w = Window.partitionBy(*by).orderBy(*order).rowsBetween(*frame)
    carried = [
        pick(F.col(f"__carry_{c}"), ignorenulls=True).over(w).alias(f"{prefix}{c}")
        for c in carry
    ]
    out = unioned.select("*", *carried).filter(F.col("__side") == 1)
    return out.select(*lcols, *[f"{prefix}{c}" for c in carry])


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
    return _asof_directional(
        left, right, by, ts, tiebreak, carry, strict, forward=False, prefix="asof_"
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    by: Sequence[str],
    ts: str,
    tiebreak: str,
    carry: Sequence[str],
    strict: bool = True,
) -> DataFrame:
    """For each left row, attach the earliest right row with
    right.ts >= / > left.ts (mirror of backward; `strict=True` means
    strictly-following). Among equal-ts candidates the smallest
    `tiebreak` wins (backward picks the largest — each direction takes
    its nearest row in the total order)."""
    return _asof_directional(
        left, right, by, ts, tiebreak, carry, strict, forward=True, prefix="asof_"
    )


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    by: Sequence[str],
    ts: str,
    tiebreak: str,
    carry: Sequence[str],
    strict: bool = False,
) -> DataFrame:
    """For each left row, attach the right row closest in time (either
    direction); exact distance ties go BACKWARD (the pandas
    `merge_asof(direction="nearest")` contract). `strict=True` excludes
    same-instant rows from both directions.

    Composition: one backward + one forward pass carrying the right ts,
    then an arithmetic pick — two shuffles on the same `by` key, still
    no row explosion. Timestamp distance is computed on exact integer
    microseconds (unix_micros), not float seconds."""
    ext = [*carry, ts]
    b = _asof_directional(
        left, right, by, ts, tiebreak, ext, strict, forward=False, prefix="__b_"
    )
    bf = _asof_directional(
        b, right, by, ts, tiebreak, ext, strict, forward=True, prefix="__f_"
    )

    def _num(col: Column) -> Column:
        if isinstance(bf.schema[f"__b_{ts}"].dataType, T.TimestampType):
            return F.unix_micros(col)
        return col.cast("double")

    bts, fts, lts = F.col(f"__b_{ts}"), F.col(f"__f_{ts}"), F.col(ts)
    choose_b = bts.isNotNull() & (
        fts.isNull() | ((_num(lts) - _num(bts)) <= (_num(fts) - _num(lts)))
    )
    picked = [
        F.when(choose_b, F.col(f"__b_{c}")).otherwise(F.col(f"__f_{c}")).alias(f"asof_{c}")
        for c in carry
    ]
    return bf.select(*left.columns, *picked)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: Sequence[str],
    ts: str,
    tiebreak: str,
    carry: Sequence[str],
    direction: str = "backward",
    strict: bool | None = None,
) -> DataFrame:
    """Dispatch on `direction` ("backward" | "forward" | "nearest").

    `strict` defaults per direction: True for backward/forward
    (strictly before/after — the trading-data convention), False for
    nearest (same-instant match allowed, like pandas)."""
    dispatch = {
        "backward": (asof_join_backward, True),
        "forward": (asof_join_forward, True),
        "nearest": (asof_join_nearest, False),
    }
    if direction not in dispatch:
        raise ValueError(f"direction must be one of {sorted(dispatch)}: {direction!r}")
    fn, default_strict = dispatch[direction]
    return fn(left, right, by, ts, tiebreak, carry, strict=default_strict if strict is None else strict)
