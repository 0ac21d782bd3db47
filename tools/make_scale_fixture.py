"""Derive a larger scale-factor fixture from /root/testdata/sf0.1 by
key-offset replication — the scale-proof harness input (SCALING.md).

The driver only generates sf ≤ 0.1; this tool builds an sfN fixture
(default 10× ≈ sf1.0) whose per-replica statistics are EXACTLY those of
sf0.1, so measured runtime scaling is attributable to data volume, not
distribution drift:

- every key column is offset by replica × (domain max + 1), preserving
  all FK relationships (events.user_id lands inside the same replica's
  customer keys, lineitem keys inside the same replica's orders/part/
  supplier);
- nation/region stay single-copy (fixed dims, like TPC-H), and
  nationkey references stay valid because they are never offset;
- documents.text gets a per-replica BIJECTIVE token suffix ("tok" →
  "tok~rK", replica 0 untouched): shingle sets map 1:1, so every
  within-replica Jaccard/MinHash/SimHash relationship is preserved
  bit-for-bit while cross-replica token spaces are disjoint — near-dup
  pair counts scale ×N instead of exploding quadratically in exact
  copies. n_chars is recomputed to match the rewritten text;
- embeddings.embedding gets a per-replica dimension PERMUTATION
  (replica 0 identity): cosine geometry within a replica is exactly
  preserved (permutations are orthogonal), cross-replica vectors
  decorrelate, so ANN/cosine-dedup pair structure also scales ×N;
- events.ts gets a per-replica +r×400-day OFFSET (replica 0
  untouched): without it every replica's users land in the SAME
  (event_type, minute) buckets, so time-bucketed CO-OCCURRENCE
  (q_graph_* edges) densifies ×N instead of scaling ×N — at 100
  replicas every bucket blew the _TRI_CAP guard and the sf10 graph
  was EMPTY (measured, round 15). All within-replica deltas, windows,
  sessions, and watermark semantics are shift-invariant, so every
  per-user/per-series query is unchanged; only the unintended
  cross-replica bucket collisions go away.

Everything is PyArrow-level so the physical parquet schemas (including
the nanosecond event timestamps the streaming reader depends on) are
byte-identical to the driver's fixtures.

Usage:
    python tools/make_scale_fixture.py [out_dir] [replicas]
    # default: /root/repo/.scale/sf1.0  10
"""

from __future__ import annotations

import os
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

# key column → domain; base offset = max(domain) + 1, measured from SRC.
DOMAINS = {
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "lineitem": {"l_orderkey": "orderkey", "l_partkey": "partkey", "l_suppkey": "suppkey"},
    "customer": {"c_custkey": "custkey"},
    "supplier": {"s_suppkey": "suppkey"},
    "part": {"p_partkey": "partkey"},
    "events": {"event_id": "eventid", "user_id": "custkey"},
    "documents": {"doc_id": "docid"},
    "embeddings": {"vec_id": "vecid"},
}
DOMAIN_SOURCE = {
    "orderkey": ("orders", "o_orderkey"),
    "custkey": ("customer", "c_custkey"),
    "partkey": ("part", "p_partkey"),
    "suppkey": ("supplier", "s_suppkey"),
    "docid": ("documents", "doc_id"),
    "vecid": ("embeddings", "vec_id"),
    "eventid": ("events", "event_id"),
}


def _domain_bases() -> dict[str, int]:
    bases = {}
    for dom, (table, col) in DOMAIN_SOURCE.items():
        t = pq.read_table(os.path.join(SRC, f"{table}.parquet"), columns=[col])
        bases[dom] = pc.max(t.column(col)).as_py() + 1
    return bases


def _suffix_tokens(texts: list[str], r: int) -> list[str]:
    """Bijective per-replica token map; replica 0 is the identity."""
    if r == 0:
        return texts
    tag = f"~r{r}"
    return [" ".join(tok + tag for tok in t.split(" ")) for t in texts]


def _permute_embeddings(col: pa.ChunkedArray, r: int) -> pa.Array:
    """Per-replica dimension permutation (orthogonal → within-replica
    cosine preserved exactly); replica 0 is the identity."""
    arr = col.combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False).reshape(len(arr), -1)
    if r != 0:
        perm = np.random.RandomState(1000 + r).permutation(flat.shape[1])
        flat = flat[:, perm]
    return pa.array(list(flat.astype(np.float32)), type=arr.type)


def replicate_table(name: str, out_dir: str, replicas: int, bases: dict[str, int]) -> int:
    src_path = os.path.join(SRC, f"{name}.parquet")
    dst_path = os.path.join(out_dir, f"{name}.parquet")
    if name in ("nation", "region"):  # fixed dims: single copy
        shutil.copyfile(src_path, dst_path)
        return pq.read_metadata(dst_path).num_rows

    t = pq.read_table(src_path)
    key_cols = DOMAINS.get(name, {})
    pieces = []
    for r in range(replicas):
        cols = []
        for field in t.schema:
            col = t.column(field.name)
            if field.name in key_cols:
                off = pa.scalar(r * bases[key_cols[field.name]], type=field.type)
                col = pc.add(col, off)
            elif name == "events" and field.name == "ts":
                if r != 0:
                    unit = field.type.unit
                    per_day = {"s": 86_400, "ms": 86_400_000,
                               "us": 86_400_000_000,
                               "ns": 86_400_000_000_000}[unit]
                    ints = pc.cast(col, pa.int64())
                    ints = pc.add(ints, pa.scalar(r * 400 * per_day,
                                                  type=pa.int64()))
                    col = pc.cast(ints, field.type)
            elif name == "documents" and field.name == "text":
                col = pa.chunked_array(
                    [pa.array(_suffix_tokens(col.to_pylist(), r), type=field.type)]
                )
            elif name == "embeddings" and field.name == "embedding":
                col = _permute_embeddings(col, r)
            cols.append(col)
        piece = pa.table(cols, schema=t.schema)
        if name == "documents":  # keep n_chars == length(text) invariant
            n_chars = pc.cast(pc.utf8_length(piece.column("text")), pa.int64())
            piece = piece.set_column(
                piece.schema.get_field_index("n_chars"), "n_chars", n_chars
            )
        pieces.append(piece)
    out = pa.concat_tables(pieces)
    assert out.schema.equals(t.schema), f"{name}: schema drifted"
    pq.write_table(out, dst_path)
    return out.num_rows


def write_clustered_embeddings(
    out_dir: str, n_rows: int, n_clusters: int = 50, seed: int = 42
) -> int:
    """Mixture-of-Gaussians embeddings (round-15 verdict item 1): the
    replicated fixture's vectors are near-random, a geometry where an
    IVF coarse quantizer structurally cannot win (ANN_RECALL.md
    §Round-14 — nprobe pruning caps composite recall at ~0.84 because
    cells carry no signal). Real corpus embeddings CLUSTER; this mode
    writes an embeddings.parquet with the same schema/row count whose
    geometry gives pruning actual signal, so the exhaustive-vs-pruned
    serving decision is measured on both regimes.

    Deterministic: seeded RandomState; Zipf-ish mixture weights
    (w_i ∝ 1/(i+1) — hot topics are bigger, like real corpora); unit-
    norm centers from N(0, I_64); per-point noise σ=0.07/dim so
    within-cluster cosine ≈ 0.75 (a realistic topic-cluster
    tightness); every vector unit-normalized to match the driver
    fixture's norm convention. label = cluster % 10 keeps the
    existing label domain. Only embeddings.parquet is written — the
    dir is an ANN-grid input, not a full query fixture."""
    rng = np.random.RandomState(seed)
    dim = 64
    centers = rng.standard_normal((n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    w = 1.0 / np.arange(1, n_clusters + 1)
    w /= w.sum()
    assign = rng.choice(n_clusters, size=n_rows, p=w)
    x = centers[assign] + 0.07 * rng.standard_normal((n_rows, dim))
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    x = x.astype(np.float32)
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(n_rows, dtype=np.int64)),
            "embedding": pa.array(list(x), type=pa.list_(pa.float32())),
            "label": pa.array((assign % 10).astype(np.int32)),
        }
    )
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(t, os.path.join(out_dir, "embeddings.parquet"))
    return n_rows


def main() -> None:
    if "--clustered-embeddings" in sys.argv:
        args = [a for a in sys.argv[1:] if a != "--clustered-embeddings"]
        out_dir = args[0] if args else "/root/repo/.scale/sf1.0-clustered"
        n_rows = int(args[1]) if len(args) > 1 else 20_000
        n_clusters = int(args[2]) if len(args) > 2 else 50
        n = write_clustered_embeddings(out_dir, n_rows, n_clusters)
        print(f"embeddings   {n:>10,} rows (mixture of {n_clusters} "
              f"Gaussians) → {out_dir}")
        return
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/sf1.0"
    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    os.makedirs(out_dir, exist_ok=True)
    bases = _domain_bases()
    tables = ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]
    for name in tables:
        n = replicate_table(name, out_dir, replicas, bases)
        print(f"{name:12s} {n:>10,} rows")
    print(f"done: {out_dir} ({replicas} replicas of sf0.1)")


if __name__ == "__main__":
    main()
