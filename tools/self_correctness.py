#!/usr/bin/env python
"""Full-registry, driver-format correctness artifact (round-11 verdict
item 5): runs EVERY registered query AND its DuckDB oracle at sf0.01
and writes SELFCHECK_r{N}.json with per-query rows/schema/hash matches
in exactly the CORRECTNESS_r{N}.json shape the grading driver emits.

Why: the driver samples 50 queries per round, so most of the registry
is only covered by the pytest parity sweep; this artifact makes
"N/N green" a one-file read for any auditor, in the format they
already parse, produced by the same strict comparator the test suite
replicates from the driver (tests/parity.py — pandas-materialized
values, type-tagged canonical cells, order-insensitive multiset).

Usage:
    python tools/self_correctness.py [sf_dir] [out.json]

Defaults: sf_dir=/root/testdata/sf0.01, out=SELFCHECK.json. Exit code
is the number of non-green queries (0 = all green).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "SELFCHECK.json"

    from fact_hive_custom_spark.queries import ORACLE, QUERIES
    from fact_hive_custom_spark.session import get_session
    from tests.parity import (
        DriverUnhashable,
        _pandas_rows,
        _strict_rows,
        duck_connection,
    )

    spark = get_session("selfcheck", quiet=True)
    con = duck_connection(sf_dir)
    results: dict[str, dict] = {}
    n_bad = 0
    t_start = time.perf_counter()

    # Registration order — the same order the driver's artifact uses.
    for i, name in enumerate(QUERIES, 1):
        rec = {
            "rows_match": False,
            "schema_match": False,
            "hash_match": False,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
        }
        t0 = time.perf_counter()
        try:
            sdf = QUERIES[name](spark, sf_dir)
            s_cols = list(sdf.columns)
            s_rows = _pandas_rows(sdf.toPandas())
            rec["spark_rows"] = len(s_rows)
            if name not in ORACLE:
                # The driver's weaker rows-only record for non-SQL ops.
                rec["err"] = "no_oracle"
                rec["rows_match"] = True
                rec["schema_match"] = True
            else:
                rel = con.sql(ORACLE[name])
                d_cols = list(rel.columns)
                d_types = [str(t) for t in rel.types]
                d_rows = _pandas_rows(
                    rel.df(),
                    date_cols={
                        c
                        for c, t in zip(d_cols, d_types)
                        if t == "DATE"
                    },
                )
                rec["oracle_rows"] = len(d_rows)
                rec["rows_match"] = len(s_rows) == len(d_rows)
                rec["schema_match"] = sorted(s_cols) == sorted(d_cols)
                if rec["rows_match"] and rec["schema_match"]:
                    rec["hash_match"] = _strict_rows(
                        s_cols, s_rows
                    ) == _strict_rows(d_cols, d_rows)
        except DriverUnhashable as e:
            rec["err"] = f"driver-unhashable: {e}"[:300]
        except Exception as e:  # noqa: BLE001 — artifact must be total
            rec["err"] = f"{type(e).__name__}: {e}"[:300]
        results[name] = rec
        green = (
            rec["rows_match"] and rec["schema_match"] and rec["hash_match"]
        ) or rec["err"] == "no_oracle"
        if not green:
            n_bad += 1
        print(
            f"[{i}/{len(QUERIES)}] {name}: "
            f"{'green' if green else 'RED ' + str(rec)} "
            f"({time.perf_counter() - t0:.1f}s)",
            file=sys.stderr,
            flush=True,
        )

    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
        f.write("\n")
    print(
        f"{len(results)} queries, {n_bad} non-green, "
        f"{time.perf_counter() - t_start:.0f}s -> {out_path}",
        file=sys.stderr,
    )
    return n_bad


if __name__ == "__main__":
    sys.exit(main())
