"""Skew mitigation operators (SURVEY.md §4, SCALING.md).

AQE's skew-join splitting handles sort-merge joins automatically; these
are the manual remedies for the cases it does not cover:

- `salted_join`: hot-key joins where one side must replicate. The big
  (skewed) side gets a deterministic salt in [0, salt); the small side
  is replicated salt× with every salt value; the join key becomes
  (key, salt), so one hot key spreads over `salt` partitions. Cost:
  small side inflates salt× — use only when a hot key genuinely
  dominates a partition.
- `salted_aggregate`: hot-key groupBy for algebraic aggregates. Phase 1
  aggregates on (key, salt) — the hot key's rows split across salt
  reducers; phase 2 merges the partials per key. This is what Spark's
  partial aggregation already does per-partition; explicit salting adds
  a second level for keys so hot that even a single reducer's FINAL
  aggregation would be the straggler.

Both are deterministic: the salt is a hash of stable columns, never
rand().
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt_col(df: DataFrame, salt: int, from_cols: Sequence[str]) -> Column:
    return F.pmod(F.xxhash64(*[F.col(c) for c in from_cols]), F.lit(salt))


# Join types for which salting the skewed side + replicating the small
# side preserves semantics: every skewed row carries exactly ONE salt, so
# skewed-side-preserving joins are unchanged. right/full would surface
# each unmatched small-side row `salt` times (once per replica) — refuse.
_SALT_SAFE_JOINS = frozenset({"inner", "left", "leftouter", "left_outer", "left_semi", "leftsemi", "left_anti", "leftanti", "semi", "anti"})


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where `skewed` has hot keys: spread each key over
    `salt` sub-partitions by salting the skewed side and replicating
    the small side.

    Result ≡ skewed.join(small, on, how) for the skewed-side-preserving
    join types (inner / left / left_semi / left_anti). right and full
    joins are rejected: the small side's replicas would each emit an
    unmatched row, duplicating null-extended output `salt` times.
    """
    if how.lower().replace("_", "") not in {h.replace("_", "") for h in _SALT_SAFE_JOINS}:
        raise ValueError(
            f"salted_join supports inner/left/left_semi/left_anti, not {how!r}: "
            "replicating the small side duplicates its unmatched rows"
        )
    non_key = [c for c in skewed.columns if c not in on] or list(on)
    s = skewed.withColumn("__salt", _salt_col(skewed, salt, non_key))
    r = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = s.join(r, [*on, "__salt"], how)
    return out.drop("__salt")


def salted_aggregate(
    df: DataFrame,
    key: Sequence[str],
    salt: int = 16,
    **aggs: tuple[str, str],
) -> DataFrame:
    """Two-level aggregation for hot keys. `aggs` maps output column →
    (input column, fn) with fn ∈ {sum, count, min, max} (algebraic —
    mergeable partials). Result ≡ df.groupBy(key).agg(...)."""
    mergers = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    firsts = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    for _, (col, fn) in aggs.items():
        if fn not in mergers:
            raise ValueError(f"non-algebraic aggregate {fn!r} cannot be salted")

    non_key = [c for c in df.columns if c not in key] or list(key)
    salted = df.withColumn("__salt", _salt_col(df, salt, non_key))
    partial = salted.groupBy(*key, "__salt").agg(
        *[firsts[fn](col).alias(out) for out, (col, fn) in aggs.items()]
    )
    return partial.groupBy(*key).agg(
        *[mergers[fn](out).alias(out) for out, (_, fn) in aggs.items()]
    )
