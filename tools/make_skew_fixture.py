#!/usr/bin/env python
"""Derive a HOT-KEY variant of the sf1.0 scale fixture (VERDICT r12
item 1): same schemas, same row counts, same FK closure — but one
user_id holds ~20% of events and one (supplier, part) pair holds ~20%
of lineitem. This converts the salting/AQE-skew design-arguments in
the query docstrings into something measurable: run the same query on
the uniform and the skewed fixture and compare walls (tools/
skew_sweep.py writes the SKEW_r13.md table).

Skew rule (deterministic, content-based, no RNG):
- events:  rows with event_id % 5 == 0 get user_id := hot_user, where
  hot_user is the smallest existing user_id (stays inside the customer
  FK domain, so join/cohort queries keep their semantics);
- lineitem: rows with l_orderkey % 5 == 0 get l_suppkey := hot_supp
  and l_partkey := hot_part (smallest existing keys — the part rows
  keep their brand, so ~20% of lineitem now lands on ONE brand/size
  cell and ONE supplier);
- documents (round 14, VERDICT r13 item 6): rows with doc_id % 5 == 0
  get a fixed 25-token boilerplate HEADER prepended — one run of ~23
  identical 3-gram shingles and one identical aligned 20-token block
  now appear in ~20% of the corpus, the license-header/navbox shape
  that stresses shingle-keyed dedup (minhash bands, prefix filters,
  span hashing) on the doc-frequency axis instead of the row-count
  axis the events/lineitem rules cover;
- every other table is copied byte-for-byte.

A 20% hot key is the "one celebrity account / one SKU on promotion"
shape: at 100 TB the hot reducer would receive 20 TB — the uniform
plan is not slow there, it is dead. Fixture scale only shows the
straggler ratio; the ratio is what transfers.

Usage: python tools/make_skew_fixture.py [src_dir] [out_dir]
       # default: /root/repo/.scale/sf1.0 → /root/repo/.scale/sf1.0-skew
"""

from __future__ import annotations

import os
import shutil
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/sf1.0"
    out = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.scale/sf1.0-skew"
    os.makedirs(out, exist_ok=True)

    ev = pq.read_table(f"{src}/events.parquet")
    hot_user = pc.min(ev.column("user_id")).as_py()
    # event_id % 5 == 0 via integer divide/multiply (no modulo kernel)
    mask = pc.equal(
        pc.subtract(
            ev.column("event_id"),
            pc.multiply(pc.divide(ev.column("event_id"), 5), 5),
        ),
        0,
    )
    new_user = pc.if_else(mask, pa.scalar(hot_user, pa.int64()), ev.column("user_id"))
    ev = ev.set_column(ev.schema.get_field_index("user_id"), ev.schema.field("user_id"), new_user)
    pq.write_table(ev, f"{out}/events.parquet")
    n_hot = pc.sum(pc.cast(pc.equal(new_user, hot_user), pa.int64())).as_py()
    print(f"events: hot user_id={hot_user} holds {n_hot}/{ev.num_rows} rows "
          f"({100.0 * n_hot / ev.num_rows:.1f}%)")

    li = pq.read_table(f"{src}/lineitem.parquet")
    hot_supp = pc.min(li.column("l_suppkey")).as_py()
    hot_part = pc.min(li.column("l_partkey")).as_py()
    lmask = pc.equal(
        pc.subtract(
            li.column("l_orderkey"),
            pc.multiply(pc.divide(li.column("l_orderkey"), 5), 5),
        ),
        0,
    )
    new_supp = pc.if_else(lmask, pa.scalar(hot_supp, pa.int64()), li.column("l_suppkey"))
    new_part = pc.if_else(lmask, pa.scalar(hot_part, pa.int64()), li.column("l_partkey"))
    li = li.set_column(li.schema.get_field_index("l_suppkey"), li.schema.field("l_suppkey"), new_supp)
    li = li.set_column(li.schema.get_field_index("l_partkey"), li.schema.field("l_partkey"), new_part)
    pq.write_table(li, f"{out}/lineitem.parquet")
    ln_hot = pc.sum(pc.cast(pc.equal(new_supp, hot_supp), pa.int64())).as_py()
    print(f"lineitem: hot l_suppkey={hot_supp} / l_partkey={hot_part} hold "
          f"{ln_hot}/{li.num_rows} rows ({100.0 * ln_hot / li.num_rows:.1f}%)")

    # documents: boilerplate header on doc_id % 5 == 0 (exactly 25
    # tokens — 23 identical shingles + one full aligned 20-token span
    # block per hot doc; deterministic, no RNG)
    docs = pq.read_table(f"{src}/documents.parquet")
    BOILER = " ".join(
        "common creative license header all rights reserved under the "
        "terms of this document may be redistributed verbatim provided "
        "this notice is preserved see section four".split()
    )
    assert len(BOILER.split()) == 25
    dmask = pc.equal(
        pc.subtract(
            docs.column("doc_id"),
            pc.multiply(pc.divide(docs.column("doc_id"), 5), 5),
        ),
        0,
    )
    new_text = pc.if_else(
        pc.and_(dmask, pc.is_valid(docs.column("text"))),
        pc.binary_join_element_wise(
            pa.scalar(BOILER), docs.column("text"), " "
        ),
        docs.column("text"),
    )
    docs = docs.set_column(
        docs.schema.get_field_index("text"), docs.schema.field("text"), new_text
    )
    pq.write_table(docs, f"{out}/documents.parquet")
    dn_hot = pc.sum(pc.cast(dmask, pa.int64())).as_py()
    print(f"documents: boilerplate header on {dn_hot}/{docs.num_rows} docs "
          f"({100.0 * dn_hot / docs.num_rows:.1f}%)")

    for t in TABLES:
        if t in ("events", "lineitem", "documents"):
            continue
        shutil.copy(f"{src}/{t}.parquet", f"{out}/{t}.parquet")
    print(f"skew fixture at {out}")


if __name__ == "__main__":
    main()
