"""Streaming sources beyond the local file replay.

Production deployments read ``events`` from Kafka; the spark-sql-kafka
package is not on this image's classpath, so the connector is a gated stub
(same policy as sources/lakehouse.py). The schema contract and the
value-parsing logic are real — swapping the file replay for Kafka changes
only the source node of the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark.sql import types as T

from .windows import _events_schema

#: Kafka wire contract: JSON values carry event time as int64 epoch-nanos
#: (producer-side convention), converted to µs TimestampType on ingest.
KAFKA_EVENTS_SCHEMA = _events_schema(T.LongType())


def kafka_available(spark: SparkSession) -> bool:
    try:
        spark.readStream.format("kafka")  # resolves the provider lazily...
        # provider resolution only happens at load(); probe the class instead
        jvm = spark._jvm
        jvm.java.lang.Class.forName("org.apache.spark.sql.kafka010.KafkaSourceProvider")
        return True
    except Exception:
        return False


def read_events_kafka(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str = "events",
    starting_offsets: str = "latest",
) -> DataFrame:
    """Kafka source for the events stream: JSON values parsed into the events
    schema, Kafka timestamp column dropped in favor of the event-time field
    (watermarks must key on event time, not broker arrival time)."""
    if not kafka_available(spark):
        raise NotImplementedError(
            "spark-sql-kafka is not on the classpath in this environment — submit with "
            "--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version>"
        )
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    parsed = raw.select(
        F.from_json(F.col("value").cast("string"), KAFKA_EVENTS_SCHEMA).alias("e")
    ).select("e.*")
    return parsed.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
