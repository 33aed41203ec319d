"""Custom Python Data Source (Spark 4 ``pyspark.sql.datasource`` API)
[EXT].

The reference hard-wires its inputs to SQL connections
(``connection.rb``, ``download_manager.rb``); a Spark-native engine
instead plugs new inputs in as first-class DataSource V2 sources so
every downstream operator (pushdown, AQE, streaming) composes with
them. ``SyntheticDocsDataSource`` is the template: a deterministic,
partitioned generator with the same split-based parallel-read shape a
real external source (HTTP API, keyed blob store, proprietary format)
would use — each InputPartition is read independently by an executor,
so a 1000-executor cluster fans the scan out with no driver
involvement beyond planning the partition list.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class SyntheticDocsDataSource(DataSource):
    """``spark.read.format("synthdocs").option("n", N)`` — N
    deterministic rows ``(id, bucket, payload)`` striped over
    ``partitions`` splits."""

    @classmethod
    def name(cls) -> str:
        return "synthdocs"

    def schema(self) -> str:
        return "id bigint, bucket int, payload string"

    def reader(self, schema) -> "SyntheticDocsReader":
        return SyntheticDocsReader(self.options)


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.n = int(options.get("n", 1000))
        self.num_partitions = int(options.get("partitions", 8))

    def partitions(self):
        # Planning-time split list: the only driver-side work. Each
        # split knows its stripe; rows are generated executor-side.
        return [InputPartition(i) for i in range(self.num_partitions)]

    def read(self, partition: InputPartition):
        # Executor-side: stripe i reads ids i, i+P, i+2P, ... so the
        # row->partition mapping is stable under any parallelism.
        for id_ in range(partition.value, self.n, self.num_partitions):
            yield (id_, id_ % 10, f"doc-{id_:08d}")


def register_synthdocs(spark) -> None:
    """Idempotent registration of the synthdocs format on a session."""
    spark.dataSource.register(SyntheticDocsDataSource)
