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
