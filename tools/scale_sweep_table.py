#!/usr/bin/env python
"""Turn a `pytest tests/test_scale.py --durations=0` log into the
SCALING.md sweep table: one row per query with its sf1.0 wall time,
sorted slowest-first, plus the pass/fail summary line.

Usage:
    python tools/scale_sweep_table.py .scale_sweep_r11.log [BENCH_rNN.json]

If a BENCH json is given, each query also gets its sf0.1 headline
median and the sf1.0/sf0.1 ratio — any ratio > 10 is flagged for a
plan note (the round-10 verdict's sweep-evidence bar).
"""

from __future__ import annotations

import json
import re
import sys


def main() -> None:
    log_path = sys.argv[1]
    bench = {}
    if len(sys.argv) > 2:
        with open(sys.argv[2]) as f:
            doc = json.load(f)
        # the driver wraps bench.py's JSON line under "parsed"
        bench = doc.get("queries") or doc.get("parsed", {}).get(
            "queries", {}
        )

    durations: dict[str, float] = {}
    passed = failed = None
    with open(log_path) as f:
        for line in f:
            m = re.match(
                r"\s*([\d.]+)s call\s+tests/test_scale\.py::"
                r"test_query_matches_oracle_at_scale\[(\w+)\]",
                line,
            )
            if m:
                durations[m.group(2)] = float(m.group(1))
            s = re.search(r"(\d+) passed", line)
            if s:
                passed = int(s.group(1))
            s = re.search(r"(\d+) failed", line)
            if s:
                failed = int(s.group(1))

    print(f"Queries timed: {len(durations)}; passed={passed} failed={failed}")
    print()
    print("| query | sf1.0 wall s | sf0.1 bench s | ratio |")
    print("|---|---|---|---|")
    for name, sec in sorted(durations.items(), key=lambda kv: -kv[1]):
        b = bench.get(name)
        if b:
            ratio = sec / b if b else float("nan")
            flag = " **>10× — plan note**" if ratio > 10 else ""
            print(f"| {name} | {sec:.1f} | {b:.2f} | {ratio:.1f}×{flag} |")
        else:
            print(f"| {name} | {sec:.1f} | — | — |")


if __name__ == "__main__":
    main()
