"""Kafka source/sink option wiring (jar-gated).

Reference: input.Kafka (/root/reference/lumbermill/input/Kafka.py:39-85)
consumes topics with a consumer group; output.Kafka
(/root/reference/lumbermill/output/Kafka.py:29-74) publishes a
formatted field to a topic.

The spark-sql-kafka connector jar is not present in this runtime, so
the option-building is split from the plan-building: the pure
functions below are unit-testable without a broker or jar, and
``kafka_source``/``kafka_sink`` fail fast with a clear message when
the connector is missing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def kafka_read_options(
    brokers: list[str] | str,
    topics: list[str] | str,
    group_id: str | None = None,
    starting_offsets: str = "latest",
    fail_on_data_loss: bool = False,
) -> dict[str, str]:
    """input.Kafka config → readStream options (Kafka.py:39-61:
    brokers/topics/group_id/auto_offset_reset)."""
    if isinstance(brokers, list):
        brokers = ",".join(brokers)
    if isinstance(topics, list):
        topics = ",".join(topics)
    opts = {
        "kafka.bootstrap.servers": brokers,
        "subscribe": topics,
        "startingOffsets": starting_offsets,
        "failOnDataLoss": str(bool(fail_on_data_loss)).lower(),
    }
    if group_id:
        opts["kafka.group.id"] = group_id
    return opts


def kafka_write_options(
    brokers: list[str] | str,
    topic: str,
) -> dict[str, str]:
    """output.Kafka config → writeStream options (output/Kafka.py:29-50)."""
    if isinstance(brokers, list):
        brokers = ",".join(brokers)
    return {"kafka.bootstrap.servers": brokers, "topic": topic}


def _require_connector(spark: SparkSession) -> None:
    cls = "org.apache.spark.sql.kafka010.KafkaSourceProvider"
    try:
        # Utils.classForName resolves against Spark's context
        # classloader, which sees jars added via spark.jars.packages
        # (they live in MutableURLClassLoader, invisible to the system
        # classloader that single-arg Class.forName consults).
        spark._jvm.org.apache.spark.util.Utils.classForName(
            cls, False, False)
        return
    except Exception:  # noqa: BLE001 — fall through to the system probe
        pass
    try:
        spark._jvm.java.lang.Class.forName(cls)
    except Exception as exc:  # noqa: BLE001
        raise RuntimeError(
            "spark-sql-kafka connector jar not on the classpath; add "
            "--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<ver>"
        ) from exc


def kafka_source(spark: SparkSession, value_schema: str | None = None,
                 **cfg) -> DataFrame:
    """readStream from Kafka; value bytes optionally JSON-parsed into
    ``value_schema`` columns (the reference pairs input.Kafka with
    parser.Json)."""
    _require_connector(spark)
    reader = spark.readStream.format("kafka")
    for k, v in kafka_read_options(**cfg).items():
        reader = reader.option(k, v)
    df = reader.load()
    if value_schema:
        df = df.select(
            F.col("key").cast("string").alias("key"),
            F.from_json(F.col("value").cast("string"), value_schema)
            .alias("v"), "topic", "partition", "offset", "timestamp",
        ).select("key", "v.*", "topic", "partition", "offset", "timestamp")
    return df


def kafka_sink(df: DataFrame, checkpoint: str, value_col: str = "value",
               key_col: str | None = None, **cfg):
    """writeStream to Kafka: value_col (string/binary) becomes the
    record value."""
    _require_connector(df.sparkSession)
    cols = [F.col(value_col).cast("string").alias("value")]
    if key_col:
        cols.insert(0, F.col(key_col).cast("string").alias("key"))
    writer = df.select(*cols).writeStream.format("kafka")
    for k, v in kafka_write_options(**cfg).items():
        writer = writer.option(k, v)
    return writer.option("checkpointLocation", checkpoint).start()
