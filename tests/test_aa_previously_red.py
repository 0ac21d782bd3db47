"""Strict parity for queries whose LATEST driver CORRECTNESS row was
ever red — named (and sorted) to run before the rest of the suite so a
regression in a previously-red query is the first failure you see.

Current roster: q_llm_domain_mix went r3-red on a float-ROUND knife
edge; the fix (integer ppm shares, commit 422a57b) is local-green but
the driver had not re-sampled it as of round 4. Remove an entry only
after a later driver round samples it green.
"""

from __future__ import annotations

import pytest

from tests.parity import DEFAULT_SF_DIR, compare

PREVIOUSLY_RED = ["q_llm_domain_mix"]


@pytest.mark.previously_red
@pytest.mark.parametrize("name", PREVIOUSLY_RED)
def test_previously_red_query_is_green(spark, name):
    ok, detail = compare(spark, name, DEFAULT_SF_DIR)
    assert ok, f"{name} (previously driver-red): {detail}"
