#!/usr/bin/env python
"""Round-16 heavy-row scale sweep (VERDICT r15 item 3): time the named
queries at a given fixture dir via the noop sink, two passes each
(cold-ish, warm), one JSON line per query.

Usage:
    python tools/sweep_r16.py <sf_dir> <query> [query ...] [--passes N]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main() -> int:
    args = sys.argv[1:]
    passes = 2
    if "--passes" in args:
        i = args.index("--passes")
        passes = int(args[i + 1])
        del args[i : i + 2]
    sf_dir, names = args[0], args[1:]

    from fact_hive_custom_spark.queries import QUERIES
    from fact_hive_custom_spark.session import get_session

    spark = get_session("sweep-r16", quiet=True)
    for name in names:
        times = []
        for _ in range(passes):
            t0 = time.perf_counter()
            spark.sparkContext.setJobDescription(f"sweep:{name}")
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            times.append(round(time.perf_counter() - t0, 2))
        print(
            json.dumps({"query": name, "sf_dir": sf_dir, "passes": times}),
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
