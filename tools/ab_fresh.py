#!/usr/bin/env python
"""Paired A/B harness replicating the driver's bench condition for ONE
query: fresh JVM (this process), the same q_agg_flagship warmup
bench.py runs, then N timed passes via the noop sink; prints one JSON
line with the per-pass times and the median.

Usage:
    python tools/ab_fresh.py <query> [n_passes]

Variant selection happens INSIDE the operator code via the
FHC_AB_VARIANT env var (temporary gates added while an A/B is live,
removed once the decision is made). Invoke alternately, e.g.:

    for i in 1 2 3 4; do
      FHC_AB_VARIANT=old python tools/ab_fresh.py q_llm_jaccard_dedup
      FHC_AB_VARIANT=new python tools/ab_fresh.py q_llm_jaccard_dedup
    done

Alternation inside the SAME quiet window is the point — host drift is
±30% across sessions (BASELINE.md), so unpaired numbers are noise.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    name = sys.argv[1]
    n_passes = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from fact_hive_custom_spark.queries import QUERIES
    from fact_hive_custom_spark.session import get_session

    spark = get_session("ab-fresh", quiet=True)

    def run(q: str) -> float:
        t0 = time.perf_counter()
        QUERIES[q](spark, sf_dir).write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    run("q_agg_flagship")  # JVM/codegen warmup, untimed (bench.py parity)

    times = [run(name) for _ in range(n_passes)]
    print(
        json.dumps(
            {
                "query": name,
                "variant": os.environ.get("FHC_AB_VARIANT", ""),
                "passes": times,
                "median": sorted(times)[len(times) // 2],
            }
        ),
        flush=True,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
