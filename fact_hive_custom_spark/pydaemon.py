"""Python worker daemon with the heavy UDF dependencies pre-imported.

Spark's Python workers FORK from a daemon process (pyspark/daemon.py);
anything imported in the daemon before the fork is shared with every
worker copy-on-write. Stock Spark imports pandas/pyarrow/numpy lazily
INSIDE each worker when it first deserializes a pandas UDF, so every
worker pays the ~1 s import — and the JVM's PythonWorkerFactory reaps
idle workers after a hardcoded 60 s, so a bench that interleaves JVM
and Python stages re-pays ~n_cores × import on every Python stage
(measured round 15: 3–6 s per pass on local[32], the dominant cost of
q_udf_cogroup's bench row). Importing the libraries HERE moves that
cost to once per daemon (= once per executor): respawned workers fork
with pandas already in memory (guide §4.5, init-once taken to the
process level).

Selected via spark.python.daemon.module (session.py). Delegates to the
stock pyspark.daemon for everything else — runpy preserves argv, so
alternate worker modules (pyspark.sql.worker.*) keep working.
"""

from __future__ import annotations

import importlib
import runpy

for _mod in ("numpy", "pandas", "pyarrow", "pyarrow.pandas_compat"):
    try:
        importlib.import_module(_mod)
    except Exception:  # pragma: no cover — missing lib: workers import lazily as before
        pass

if __name__ == "__main__":
    runpy.run_module("pyspark.daemon", run_name="__main__", alter_sys=True)
