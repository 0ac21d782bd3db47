"""Registry-wide plan-shape drift net (VERDICT r12 item 5).

tests/test_plans.py pins ~150 hand-chosen shapes; this suite covers
the rest mechanically: every registered query's pre-AQE physical plan
is fingerprinted (exchange / broadcast / python / cartesian counts,
plans.inspect.plan_counts) and compared against the committed
PLAN_SNAPSHOT.json. A query whose shuffle count GROWS, or which newly
acquires a Python-eval node or a cartesian, fails — silent plan
regressions in never-pinned queries are the class this catches.

Improvements (fewer exchanges, dropped Python) pass but leave the
snapshot stale — regenerate with `python tools/plan_snapshot.py` so
the next regression is measured from the better plan.

Deliberate re-plans: regenerate the snapshot in the same commit and
explain the grown count in the commit message (the JSON diff is the
review surface). ALLOW_GROWTH below is for queries whose count is
legitimately nondeterministic, not a bypass for regressions.
"""

from __future__ import annotations

import json
import os

import pytest

from fact_hive_custom_spark.plans import inspect as plans
from fact_hive_custom_spark.queries import QUERIES

SF_DIR = "/root/testdata/sf0.01"
SNAP_PATH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         "PLAN_SNAPSHOT.json")

with open(SNAP_PATH) as _f:
    _SNAP = json.load(_f)

# name → extra exchanges tolerated (legitimately nondeterministic plans
# only — none known today; a regression goes here never).
ALLOW_GROWTH: dict[str, int] = {}

# The AQE width-collapse net (round-15 verdict item 2, generalizing the
# round-14 manual audit): plans.width_collapse_risks flags any Python-
# exec or Generate node whose nearest downstream exchange is
# AQE-coalescible (not REPARTITION_BY_NUM, not broadcast) — the static
# shape shared by all four round-14 collapses (SCALING.md §Round-14).
# A query may carry the shape ONLY with a measured/structural
# disposition below; anything new fails until width-pinned or measured
# coalesce-neutral at sf1.0 and recorded here (SCALING.md §Round-15
# has the A/B table).
WIDTH_RISK_ALLOWED: dict[str, list[str]] = {
    # pandas UDAF over 3 whole-table groups: parallelism is capped at
    # |groups|=3 structurally; coalescing cannot make it worse
    # (priced in its docstring; SCALING.md §Round-14 audit).
    "q_udaf_pandas": ["FlatMapGroupsInPandas <- Exchange[ENSURE_REQUIREMENTS]"],
    # Bounded post-aggregate Generates: each explodes a small
    # aggregated array (per-group model params, per-key posting lists
    # bounded by HAVING/top-k, set-op tallies) where the exchange
    # output is thousands of rows and the inflation factor is a small
    # constant — measured coalesce on/off at sf1.0 (round-15 A/B,
    # SCALING.md §Round-15): 18 of 20 within ±13% noise; the worst,
    # q_basket_lift / q_graph_adamic_adar / q_graph_degree_dist,
    # re-measured median-of-3 interleaved at 1.09× / 1.16× / 1.14× —
    # mild, nowhere near the 3–8× collapse class this net exists for.
    "q_agg_cms_estimate": ["Generate <- Exchange[ENSURE_REQUIREMENTS]"],
    "q_basket_lift": ["Generate <- Exchange[ENSURE_REQUIREMENTS]"],
    "q_event_overlap_matrix": ["Generate <- Exchange[ENSURE_REQUIREMENTS]"],
    "q_except_all": ["Generate <- Exchange[ENSURE_REQUIREMENTS]"],
    "q_graph_adamic_adar": ["Generate <- Exchange[ENSURE_REQUIREMENTS]"],
    "q_graph_clustering_coeff": ["Generate <- Exchange[ENSURE_REQUIREMENTS]"],
    "q_graph_degree_dist": ["Generate <- Exchange[ENSURE_REQUIREMENTS]"],
    "q_graph_link_predict": ["Generate <- Exchange[ENSURE_REQUIREMENTS]"],
    "q_intersect_all": ["Generate <- Exchange[ENSURE_REQUIREMENTS]"],
    "q_llm_bloom_vocab": ["Generate <- Exchange[ENSURE_REQUIREMENTS]"],
    "q_llm_bpe_pairs": ["Generate <- Exchange[ENSURE_REQUIREMENTS]"],
    "q_llm_dedup_eval": ["Generate <- Exchange[ENSURE_REQUIREMENTS]"],
    "q_llm_minhash_lsh": ["Generate <- Exchange[ENSURE_REQUIREMENTS]"],
    "q_llm_simhash_pairs": ["Generate <- Exchange[ENSURE_REQUIREMENTS]"],
    "q_orders_backlog": ["Generate <- Exchange[ENSURE_REQUIREMENTS]"],
    "q_stat_fisher_exact": ["Generate <- Exchange[ENSURE_REQUIREMENTS]"],
    "q_ts_holt_linear": ["Generate <- Exchange[ENSURE_REQUIREMENTS]"],
    "q_ts_holt_winters": ["Generate <- Exchange[ENSURE_REQUIREMENTS]"],
    "q_ts_ljung_box": ["Generate <- Exchange[ENSURE_REQUIREMENTS]"],
    "q_ts_xcorr": ["Generate <- Exchange[ENSURE_REQUIREMENTS]"],
}


def test_snapshot_covers_registry():
    """Adding a query without re-running tools/plan_snapshot.py fails
    here — the net only works if it covers everything."""
    snap_names = set(_SNAP["queries"]) | {
        s.split(":")[0] for s in _SNAP["skipped"]
    }
    assert snap_names == set(QUERIES), (
        f"snapshot drift: missing={sorted(set(QUERIES) - snap_names)[:5]} "
        f"stale={sorted(snap_names - set(QUERIES))[:5]} — "
        "regenerate with `python tools/plan_snapshot.py`"
    )


@pytest.mark.parametrize("name", sorted(_SNAP["queries"]))
def test_plan_shape_has_not_regressed(spark, name):
    if name not in QUERIES:
        pytest.skip("query removed; snapshot stale (covered above)")
    snap = _SNAP["queries"][name]
    got = plans.plan_counts(QUERIES[name](spark, SF_DIR))
    slack = ALLOW_GROWTH.get(name, 0)
    for k in ("hash_ex", "single_ex", "range_ex"):
        assert got[k] <= snap[k] + slack, (
            f"{name}: {k} grew {snap[k]} → {got[k]} — a new shuffle in a "
            "previously-unpinned query; justify and re-snapshot or fix"
        )
    assert not (got["python"] and not snap["python"]), (
        f"{name}: plan newly contains Python evaluation"
    )
    assert not (got["cartesian"] and not snap["cartesian"]), (
        f"{name}: plan newly contains a cartesian/nested-loop join"
    )


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_unvetted_width_collapse_risk(spark, name):
    """The standing AQE width-collapse net: a Python-exec or Generate
    stage fed by a coalescible exchange serializes when AQE's byte
    heuristic undersizes it (four measured collapses in round 14, up
    to 8× — SCALING.md §Round-14). Any query acquiring that shape must
    either pin the width (user-specified repartition below the stage)
    or be measured coalesce-neutral at sf1.0 and dispositioned in
    WIDTH_RISK_ALLOWED."""
    risks = plans.width_collapse_risks(QUERIES[name](spark, SF_DIR))
    allowed = WIDTH_RISK_ALLOWED.get(name, [])
    unvetted = [r for r in risks if r not in allowed]
    assert not unvetted, (
        f"{name}: width-collapse risk(s) {unvetted} — a per-row/per-call "
        "stage is fed by an AQE-coalescible exchange. Pin the width with "
        "repartition(spark.sql.shuffle.partitions, keys...) below the "
        "stage, or measure coalesce on/off at sf1.0 and allowlist with "
        "the evidence (SCALING.md §Round-15)."
    )


def test_width_net_fires_on_unpinned_cogroup(spark):
    """Negative control (round-15 verdict item 2 'done' criterion): a
    copy of q_udf_cogroup WITHOUT its user-specified (key, salt)
    repartition must be flagged — proving the net would have caught
    the worst round-14 collapse before it was measured."""
    import pandas as pd
    from pyspark.sql import functions as F

    from fact_hive_custom_spark.tables import load_table

    o = load_table(spark, SF_DIR, "orders").select("o_custkey", "o_orderkey")
    e = load_table(spark, SF_DIR, "events").select("user_id", "event_id")

    def fn(key, a, b):
        return pd.DataFrame([{"k": int(key[0]), "n": len(a) + len(b)}])

    unpinned = (
        o.groupBy("o_custkey")
        .cogroup(e.groupBy("user_id"))
        .applyInPandas(fn, "k bigint, n bigint")
    )
    assert plans.width_collapse_risks(unpinned) == [
        "FlatMapCoGroupsInPandas <- Exchange[ENSURE_REQUIREMENTS]"
    ]
    # and the pin erases the risk, exactly as the production query does
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    pinned = (
        o.repartition(nparts, "o_custkey")
        .groupBy("o_custkey")
        .cogroup(e.repartition(nparts, "user_id").groupBy("user_id"))
        .applyInPandas(fn, "k bigint, n bigint")
    )
    assert plans.width_collapse_risks(pinned) == []
