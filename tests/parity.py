"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs a registered query on Spark and its oracle SQL on DuckDB over the
same parquet fixtures, then compares row count, column names, and an
order-insensitive value multiset.

The value comparison is deliberately STRICT — it mirrors the driver's
raw value-hash, not a normalized view:

- numeric TYPE matters: int64 300 != float64 300.0 (this is exactly the
  DuckDB HUGEINT->float64 vs Spark int64 mismatch that made q_join_cross
  driver-red in round 1 while a lenient local comparator passed it);
- floats are compared by exact repr — no rounding. Queries must round
  engine-side to a width where both engines agree bit-for-bit;
- container cells (list/dict/ndarray) are a hard failure: the driver's
  hasher raises `unhashable type` on them, so any query emitting an
  array column must serialize it to a scalar first.
"""

from __future__ import annotations

import datetime
import decimal
import math
import os
from collections import Counter

import duckdb

from fact_hive_custom_spark.tables import TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_PARITY_DIR", "/root/testdata/sf0.01")


class DriverUnhashable(Exception):
    """A cell the driver's value-hash would raise on (list/dict/array)."""


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _strict_value(v):
    """Type-tagged canonical form — two cells compare equal only if the
    driver's raw hash would also see them as equal."""
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "f:NaN"
        return f"f:{v!r}"
    if isinstance(v, decimal.Decimal):
        # The driver's pandas conversion lands DuckDB DECIMAL in float64
        # (round-1 evidence: q_llm_quality_score driver-green with a
        # DECIMAL oracle column) — mirror that.
        return f"f:{float(v)!r}"
    if isinstance(v, datetime.datetime):
        return f"ts:{v.isoformat()}"
    if isinstance(v, datetime.date):
        return f"dt:{v.isoformat()}"
    if isinstance(v, bytes):
        return f"x:{v.hex()}"
    if isinstance(v, str):
        return f"s:{v}"
    if isinstance(v, (list, tuple, dict)) or type(v).__name__ == "ndarray":
        raise DriverUnhashable(f"driver-unhashable cell type {type(v).__name__}: {v!r:.80}")
    return f"?:{v}"


def _strict_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter(tuple(_strict_value(row[i]) for i in order) for row in rows)


def _is_floatish(v):
    return isinstance(v, (float, decimal.Decimal)) and not isinstance(v, bool)


def _align_key(row):
    """Sort key aligning rows across engines for tolerant comparison:
    floats blurred to 6 significant digits (≫ any FP-tail divergence,
    ≪ any semantic difference), everything else canonical-exact."""
    parts = []
    for v in row:
        if _is_floatish(v):
            f = float(v)
            if f == 0.0:
                # -0.0 formats as "-0" but +0.0 as "0": DuckDB's ROUND
                # on DOUBLE preserves the zero sign while Spark's
                # (BigDecimal HALF_UP) never emits -0.0, so without
                # normalization the two engines' zero rows sort apart
                # and every later row pairs off-by-one (observed:
                # q_llm_centroids @ sf1.0).
                f = 0.0
            parts.append("f:NaN" if math.isnan(f) else f"f:{f:.6g}")
        else:
            parts.append(_strict_value(v))
    return tuple(parts)


def _rows_close(s_rows, d_rows, rtol):
    """Cell-wise float-tolerant equality of two row lists (aligned by
    _align_key; non-float cells must match exactly)."""
    for sr, dr in zip(sorted(s_rows, key=_align_key), sorted(d_rows, key=_align_key)):
        for sv, dv in zip(sr, dr):
            if _is_floatish(sv) or _is_floatish(dv):
                sf_, df_ = float(sv), float(dv)
                if math.isnan(sf_) and math.isnan(df_):
                    continue
                if not math.isclose(sf_, df_, rel_tol=rtol, abs_tol=rtol):
                    return False, f"float diff beyond rtol: {sv!r} vs {dv!r}"
            elif _strict_value(sv) != _strict_value(dv):
                return False, f"cell mismatch: {sv!r} vs {dv!r}"
    return True, ""


def compare(
    spark, name: str, sf_dir: str = DEFAULT_SF_DIR, rtol: float = 0.0
) -> tuple[bool, str]:
    """Run query `name` on Spark and DuckDB; return (ok, detail).

    `rtol=0` (default) is the exact driver-hash mirror. A non-zero rtol
    is for SCALE runs only (tests/test_scale.py): float cells compare
    with a relative tolerance because order-of-addition differences in
    multi-million-row double sums exceed any fixed decimal rounding
    (e.g. the flagship's SUM at sf1.0 is ~2.8e10, where the two
    engines' 4-dp rounds differ by ~1e-4 — a 4e-15 relative artifact of
    IEEE754, not a semantic divergence; measured 2026-08-13). Integers,
    strings, timestamps, row counts, and schemas stay exact."""
    from fact_hive_custom_spark.queries import ORACLE, QUERIES

    sdf = QUERIES[name](spark, sf_dir)
    s_cols = list(sdf.columns)
    s_rows = [tuple(r) for r in sdf.collect()]

    if name not in ORACLE:
        # The driver records an absent oracle as `err: no_oracle` — keep
        # local behavior honest about that (weaker rows-only check).
        return True, f"rows-only ({len(s_rows)} rows) — driver will record err:no_oracle"

    con = duck_connection(sf_dir)
    res = con.execute(ORACLE[name])
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()

    if sorted(s_cols) != sorted(d_cols):
        return False, f"schema mismatch: spark={sorted(s_cols)} duck={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"row count mismatch: spark={len(s_rows)} duck={len(d_rows)}"

    try:
        s_set = _strict_rows(s_cols, s_rows)
    except DriverUnhashable as e:
        return False, f"spark side: {e}"
    try:
        d_set = _strict_rows(d_cols, d_rows)
    except DriverUnhashable as e:
        return False, f"oracle side: {e}"

    if s_set != d_set:
        if rtol > 0.0:
            order = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
            ok, why = _rows_close(
                [tuple(r[i] for i in order) for r in s_rows],
                [tuple(r[i] for i in order) for r in d_rows],
                rtol,
            )
            if ok:
                return True, f"ok within rtol={rtol} ({len(s_rows)} rows)"
            return False, f"beyond rtol={rtol}: {why}"
        only_s = list((s_set - d_set).items())[:3]
        only_d = list((d_set - s_set).items())[:3]
        return (
            False,
            f"value mismatch: spark-only={only_s} duck-only={only_d} "
            f"(cols sorted: {sorted(s_cols)})",
        )
    return True, f"ok ({len(s_rows)} rows)"
