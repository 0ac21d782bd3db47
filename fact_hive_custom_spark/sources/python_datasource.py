"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API) —
the extension seam for reading systems Spark has no built-in connector
for (internal services, bespoke formats) without leaving Python.

`SyntheticEventsDataSource` is a deterministic generator source: N rows
split across P `InputPartition`s (strided so every partition yields
rows — the parallel-read contract a real connector must honor). The
value function is pure integer arithmetic + one IEEE754 division, so
any engine recomputes it bit-for-bit — which is what makes the query
oracle-checkable (q_source_python_ds).

At 100 TB the same shape holds: partitions() returns one split per
shard/offset-range of the backing system and read() streams that split;
Spark schedules splits like any other scan.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class SyntheticEventsDataSource(DataSource):
    """format("fhcs_synthetic") — options: n (rows), partitions."""

    @classmethod
    def name(cls) -> str:
        return "fhcs_synthetic"

    def schema(self) -> str:
        return "id BIGINT, bucket INT, score DOUBLE"

    def reader(self, schema) -> DataSourceReader:
        return _SyntheticReader(self.options)


class _SyntheticReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", 10000))
        self.num_parts = int(options.get("partitions", 8))

    def partitions(self):
        return [InputPartition(i) for i in range(self.num_parts)]

    def read(self, partition):
        # Strided assignment: partition i yields rows i, i+P, i+2P, …
        # (Knuth multiplicative hash keeps score uncorrelated with id;
        # exact in int64 and float64 for any n here.)
        for k in range(partition.value, self.n, self.num_parts):
            yield (k, k % 97, ((k * 2654435761) % 1000003) / 1000003)
