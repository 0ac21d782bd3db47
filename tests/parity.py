"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs a registered query on Spark and its oracle SQL on DuckDB over the
same parquet fixtures, then compares row count, column names, and an
order-insensitive value multiset. Values are normalized to canonical
strings (floats via repr, timestamps via isoformat) so the comparison
matches what a value-hash would see.
"""

from __future__ import annotations

import datetime
import math
import os
from collections import Counter

import duckdb

from fact_hive_custom_spark.tables import TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_PARITY_DIR", "/root/testdata/sf0.01")


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _norm_value(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            return "0.0"  # merge -0.0 / 0.0
        return repr(round(v, 9))
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(_norm_value(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_norm_value(x)}" for k, x in sorted(v.items())) + "}"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, bool):
        return str(v)
    return str(v)


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter(tuple(_norm_value(row[i]) for i in order) for row in rows)


def compare(spark, name: str, sf_dir: str = DEFAULT_SF_DIR) -> tuple[bool, str]:
    """Run query `name` on Spark and DuckDB; return (ok, detail)."""
    from fact_hive_custom_spark.queries import ORACLE, QUERIES

    sdf = QUERIES[name](spark, sf_dir)
    s_cols = list(sdf.columns)
    s_rows = [tuple(r) for r in sdf.collect()]

    if name not in ORACLE:
        return True, f"rows-only ({len(s_rows)} rows)"

    con = duck_connection(sf_dir)
    res = con.execute(ORACLE[name])
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()

    if sorted(s_cols) != sorted(d_cols):
        return False, f"schema mismatch: spark={sorted(s_cols)} duck={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"row count mismatch: spark={len(s_rows)} duck={len(d_rows)}"

    s_set = _norm_rows(s_cols, s_rows)
    d_set = _norm_rows(d_cols, d_rows)
    if s_set != d_set:
        only_s = list((s_set - d_set).items())[:3]
        only_d = list((d_set - s_set).items())[:3]
        return False, f"value mismatch: spark-only={only_s} duck-only={only_d} (cols sorted: {sorted(s_cols)})"
    return True, f"ok ({len(s_rows)} rows)"
