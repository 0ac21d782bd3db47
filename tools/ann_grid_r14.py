#!/usr/bin/env python
"""Round-14 ANN grid fill: the composite IVF-pruned + trained-PQ +
exact-re-rank serving point (VERDICT r13 item 1).

The shipped q_llm_ann_tuned default (M=16·K=64·T=2·R=400) is
EXHAUSTIVE ADC — every probe scores every corpus code. The IVF
pruning dial (pq_adc_topk(nprobe=...)) composes with the trained
M=16 codebook but the intersection was never measured. This fills
IVF(nprobe ∈ {4, 8}) × trained M=16·K=64·T=2 × R ∈ {200, 400} at
sf1.0 against the same pq_exact_l2_topk ground truth ANN_RECALL.md's
PQ section uses, plus a same-session re-measure of the shipped
exhaustive point so ratios (not absolute walls) carry the decision.

Usage:
    python tools/ann_grid_r14.py [sf_dir] [n_probes] > grid.md
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/sf1.0"
    n_probes = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    k = 5

    from fact_hive_custom_spark.queries.corpus import (
        pq_adc_topk,
        pq_exact_l2_topk,
    )
    from fact_hive_custom_spark.session import get_session
    from fact_hive_custom_spark.tables import load_table

    spark = get_session("ann-grid-r14", quiet=True)
    emb = load_table(spark, sf_dir, "embeddings").cache()
    n_corpus = emb.count()

    def pairs(df) -> set:
        return {(r.probe_id, r.neighbor_id) for r in df.collect()}

    t0 = time.perf_counter()
    exact_l2 = pairs(pq_exact_l2_topk(emb, n_probes=n_probes, k=k))
    gt_sec = time.perf_counter() - t0

    print("## Round-14 grid fill: composite IVFPQ "
          "(pruned + trained + re-ranked)")
    print()
    print(f"Fixture: `{sf_dir}` — corpus {n_corpus} vectors, "
          f"{n_probes} probes, k={k}. Ground truth `pq_exact_l2_topk` "
          f"{gt_sec:.1f} s, {len(exact_l2)} pairs.")
    print()
    print("| path | operating point | cand. frac | recall@5 | wall s |")
    print("|---|---|---|---|---|")

    grid = [
        # shipped exhaustive default, re-measured for session-relative walls
        ({"pq_m": 16, "pq_k": 64, "train_rounds": 2, "rerank_r": 400},
         "M=16 K=64 T=2 + R=400 (shipped exhaustive, re-measured)", 1.0),
        ({"pq_m": 16, "pq_k": 64, "train_rounds": 2, "rerank_r": 200,
          "nprobe": 8},
         "IVF nprobe=8/16 × M=16 K=64 T=2 + R=200", 8 / 16),
        ({"pq_m": 16, "pq_k": 64, "train_rounds": 2, "rerank_r": 400,
          "nprobe": 8},
         "IVF nprobe=8/16 × M=16 K=64 T=2 + R=400", 8 / 16),
        ({"pq_m": 16, "pq_k": 64, "train_rounds": 2, "rerank_r": 200,
          "nprobe": 4},
         "IVF nprobe=4/16 × M=16 K=64 T=2 + R=200", 4 / 16),
        ({"pq_m": 16, "pq_k": 64, "train_rounds": 2, "rerank_r": 400,
          "nprobe": 4},
         "IVF nprobe=4/16 × M=16 K=64 T=2 + R=400", 4 / 16),
    ]
    for kwargs, tag, frac in grid:
        t0 = time.perf_counter()
        got = pairs(pq_adc_topk(emb, n_probes=n_probes, k=k, **kwargs))
        sec = time.perf_counter() - t0
        rec = len(exact_l2 & got) / len(exact_l2)
        print(f"| IVFPQ composite | {tag} | {frac:.2f} | {rec:.3f} "
              f"| {sec:.1f} |", flush=True)


if __name__ == "__main__":
    main()
