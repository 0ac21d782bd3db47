"""Scale-proof parity: the full oracle suite at a 10×-sf0.1 fixture
(SCALING.md §"Measured scaling").

Opt-in — generate the fixture, then point the env var at it:

    python tools/make_scale_fixture.py         # → /root/repo/.scale/sf1.0
    SPARK_GRAFT_SCALE_DIR=/root/repo/.scale/sf1.0 \
        python -m pytest tests/test_scale.py -q

Floats compare with rtol=1e-9 (SPARK_GRAFT_SCALE_RTOL to override):
multi-million-row double sums diverge across engines in the IEEE754
tail beyond any fixed decimal rounding (see tests/parity.py::compare),
while every integer, string, timestamp, row count, and schema stays
exact — so a real bug still fails loudly. The strict zero-tolerance
gate remains tests/test_parity.py at driver scale.

Outputs above SPARK_GRAFT_SCALE_DIGEST_BYTES (default 64 MB, priced as
rows × estimated schema width so narrow frames stay exact to more rows)
auto-switch to DIGEST mode (tests/parity.py::compare_digest): both
engines compute per-column null counts / sums / min / max and an
order-insensitive md5 row hash IN-ENGINE, and only the one-row digests
cross the comparator — the round-11 sweep spent 378 s dragging
q_ts_gapfill's 10.5 M rows through pandas twice for a 1.5 s Spark-only
query; digest mode keeps every non-float cell exactly checked at a
fraction of that wall.
"""

from __future__ import annotations

import os

import pytest

from fact_hive_custom_spark.queries import QUERIES
from tests.parity import compare

SCALE_DIR = os.environ.get("SPARK_GRAFT_SCALE_DIR")
RTOL = float(os.environ.get("SPARK_GRAFT_SCALE_RTOL", "1e-9"))
# Byte-priced digest switch (VERDICT r12 item 6): 64 MB ≈ the old 1 M-row
# threshold for a typical 8-column numeric frame, but narrow frames keep
# the exact pandas path to more rows and wide frames digest sooner.
DIGEST_BYTES = int(os.environ.get("SPARK_GRAFT_SCALE_DIGEST_BYTES", "64000000"))

pytestmark = pytest.mark.skipif(
    not SCALE_DIR, reason="set SPARK_GRAFT_SCALE_DIR to run the scale suite"
)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle_at_scale(spark, name):
    ok, detail = compare(
        spark, name, SCALE_DIR, rtol=RTOL, digest_bytes=DIGEST_BYTES
    )
    assert ok, f"{name} @ {SCALE_DIR}: {detail}"
