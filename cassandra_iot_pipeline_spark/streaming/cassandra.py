"""Cassandra sink backend — the production write path.

Mirrors the reference's foreachBatch writes exactly (reference:
iot-cassandra-pipeline/src/spark_consumer.py:147-153 raw at CL=ONE,
197-203 aggregates at CL=QUORUM) behind the same sink interface as
``ParquetUpsertSink``, so `streaming/pipeline.py` and `api.IoTEngine`
can swap backends with one argument.

The Spark Cassandra Connector jar
(com.datastax.spark:spark-cassandra-connector) and a reachable cluster
are production-only dependencies — absent from this test runtime — so
``write_batch`` raises a clear error if the connector is missing, and
option construction is unit-tested without it. Upsert semantics need no
engine-side work on this backend: Cassandra's last-write-wins PK upsert
(init.cql:25, 48) is exactly what the parquet backend emulates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

KEYSPACE = "iot_analytics"  # reference: init.cql:6-12


class CassandraUpsertSink:
    """Same interface as ParquetUpsertSink; writes via the Cassandra
    connector, reads back the connector's table scan."""

    def __init__(
        self,
        table: str,
        keyspace: str = KEYSPACE,
        consistency_level: str = "ONE",
        connection_host: str = "localhost",
    ) -> None:
        self.table = table
        self.keyspace = keyspace
        self.consistency_level = consistency_level
        self.connection_host = connection_host

    def writer_options(self) -> dict[str, str]:
        """The connector options the reference passes per write
        (spark_consumer.py:147-153)."""
        return {
            "keyspace": self.keyspace,
            "table": self.table,
            "spark.cassandra.connection.host": self.connection_host,
            "spark.cassandra.output.consistency.level": self.consistency_level,
        }

    def write_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():  # F4 guard, single scan
            return
        writer = batch_df.write.format("org.apache.spark.sql.cassandra").mode(
            "append"
        )
        for key, value in self.writer_options().items():
            writer = writer.option(key, value)
        try:
            writer.save()
        except Exception as exc:  # pragma: no cover - needs connector jar
            raise RuntimeError(
                "Cassandra connector unavailable in this runtime; add "
                "com.datastax.spark:spark-cassandra-connector to "
                "spark.jars.packages and point "
                "spark.cassandra.connection.host at a cluster"
            ) from exc

    def foreach_batch(self):
        return self.write_batch

    def read(self, spark: SparkSession) -> DataFrame:  # pragma: no cover
        reader = spark.read.format("org.apache.spark.sql.cassandra")
        for key, value in self.writer_options().items():
            if not key.startswith("spark.cassandra.output"):
                reader = reader.option(key, value)
        return reader.load()
