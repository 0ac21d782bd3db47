"""The evidence tooling must not rot: every artifact generator under
tools/ stays compilable, and the bench HEADLINE set stays a subset of
the registry (a renamed/removed query would otherwise only fail at
driver bench time, outside CI)."""

from __future__ import annotations

import pathlib
import py_compile

import pytest

TOOLS = sorted(
    (pathlib.Path(__file__).resolve().parents[1] / "tools").glob("*.py")
)


@pytest.mark.parametrize("path", TOOLS, ids=lambda p: p.name)
def test_tool_compiles(path):
    py_compile.compile(str(path), doraise=True)


def test_bench_headline_is_registered():
    from bench import HEADLINE
    from fact_hive_custom_spark.queries import ORACLE, QUERIES

    # q_join_bucketed's bench rows time its build and probe halves
    # separately (round-11); both resolve inside bench.run() to the
    # registered q_join_bucketed's own helpers, so the registry/oracle
    # coverage they rely on is q_join_bucketed's.
    pseudo = {"q_join_bucketed_build", "q_join_bucketed_probe"}
    assert pseudo <= set(HEADLINE)
    assert "q_join_bucketed" in QUERIES and "q_join_bucketed" in ORACLE
    real = [q for q in HEADLINE if q not in pseudo]
    missing = [q for q in real if q not in QUERIES]
    assert not missing, f"HEADLINE references unregistered queries: {missing}"
    unoracled = [q for q in real if q not in ORACLE]
    assert not unoracled, f"HEADLINE queries without oracle: {unoracled}"
