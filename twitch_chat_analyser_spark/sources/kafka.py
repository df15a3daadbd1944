"""Kafka message source/sink and the JSON wire format (A1-A3).

Reference wire format (`Message.java:26-43`): the Kafka record value is a
JSON object ``{"timestamp": <epoch-millis>, "channel", "username",
"message"}``; the record key is the message's epoch-millis
(`Bot.java:136`). The consumer starts from committed offsets with an
earliest fallback under group ``twitch_chat_analyser``
(`EmoteAnalyser.java:65-78`).

Spark-side design:
- serde is pure column expressions (``from_json`` / ``to_json``) so it
  fuses into whole-stage codegen with whatever comes next — no UDF, no
  Python in the hot path, and the identical expressions work on batch
  DataFrames (replay/backfill) and streaming DataFrames.
- offset tracking moves from the Kafka consumer group into the Spark
  streaming checkpoint (exactly-once with the foreachBatch merge sink in
  ``streaming/pipeline.py``); ``startingOffsets=earliest`` reproduces the
  reference's committed-offsets-or-earliest behavior on first start.
- malformed records: the reference's deserializer throws and poisons the
  job on bad JSON (`MessageDeserializationSchema.java:14-18` just
  propagates). We instead drop nulls after ``from_json`` (PERMISSIVE
  mode), which is the only sane behavior on an infinite-retention topic —
  documented deviation.

At 100 TB / high-throughput topics: one Spark input partition per Kafka
partition; use ``minPartitions`` to fan out hotter topics wider than
their partition count. The serde itself has no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# The on-the-wire JSON shape (Message.java:26-33). `timestamp` is
# epoch-millis BIGINT on the wire; the engine-internal relation carries
# both the raw millis and a proper TIMESTAMP column (ingest.messages).
WIRE_SCHEMA = T.StructType(
    [
        T.StructField("timestamp", T.LongType(), False),
        T.StructField("channel", T.StringType(), False),
        T.StructField("username", T.StringType(), False),
        T.StructField("message", T.StringType(), False),
    ]
)

CONSUMER_GROUP = "twitch_chat_analyser"  # EmoteAnalyser.java:29


def parse_wire(kafka_df: DataFrame) -> DataFrame:
    """Kafka record -> parsed wire struct ``m`` + ``_ok`` validity flag
    (valid JSON with every required field). Shared by the dropping
    decoder and the observed-metrics decoder so the validity rule can
    never fork between them."""
    parsed = kafka_df.select(
        F.from_json(F.col("value").cast("string"), WIRE_SCHEMA).alias("m")
    )
    return parsed.withColumn(
        "_ok",
        F.col("m").isNotNull()
        & F.col("m.timestamp").isNotNull()
        & F.col("m.channel").isNotNull()
        & F.col("m.username").isNotNull()
        & F.col("m.message").isNotNull(),
    )


def project_messages(parsed: DataFrame) -> DataFrame:
    """Parsed wire struct -> normalized message relation."""
    return parsed.select(
        F.timestamp_millis(F.col("m.timestamp")).alias("ts"),
        F.col("m.timestamp").alias("timestamp"),
        F.col("m.channel").alias("channel"),
        F.col("m.username").alias("username"),
        F.col("m.message").alias("message"),
    )


def decode_messages(kafka_df: DataFrame) -> DataFrame:
    """Kafka record shape (binary ``value``) -> normalized message
    relation ``(ts TIMESTAMP, timestamp BIGINT, channel, username,
    message)`` — A2. Works identically on batch and streaming frames.

    Records whose value is not valid wire JSON (or is missing any
    required field) are dropped.
    """
    return project_messages(parse_wire(kafka_df).filter("_ok"))


def encode_messages(messages: DataFrame) -> DataFrame:
    """Normalized message relation -> Kafka producer shape
    ``(key BINARY, value BINARY)`` — A3, the Bot's producer side
    (`Bot.java:136`, `MessageSerializer.java:8-22`): key is the
    epoch-millis rendered as a string, value is the wire JSON."""
    ms = (
        F.col("timestamp")
        if "timestamp" in messages.columns
        else F.unix_millis("ts")
    )
    return messages.select(
        ms.cast("string").cast("binary").alias("key"),
        F.to_json(
            F.struct(
                ms.alias("timestamp"),
                F.col("channel"),
                F.col("username"),
                F.col("message"),
            )
        )
        .cast("binary")
        .alias("value"),
    )


def kafka_message_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
    min_partitions: int | None = None,
    source_format: str = "kafka",
) -> DataFrame:
    """A1: the streaming message source. Returns the same relation as
    ``decode_messages`` so every downstream pipeline is source-agnostic
    (file stream in tests, Kafka in production).

    The real connector needs the spark-sql-kafka jar on the classpath
    and a broker — neither exists in this container. ``source_format``
    swaps the provider name ONLY (every option and the whole downstream
    decode plan is identical), which lets tests drive this exact reader
    construction end-to-end against a Python DataSource stub that
    emits wire-format records (tests/test_kafka_serde.py); "kafka"
    itself is a reserved provider name that cannot be stubbed.
    """
    reader = (
        spark.readStream.format(source_format)
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .option("kafka.group.id", CONSUMER_GROUP)
    )
    if min_partitions:
        reader = reader.option("minPartitions", min_partitions)
    return decode_messages(reader.load())


def write_message_stream(
    messages: DataFrame,
    bootstrap_servers: str,
    topic: str,
    checkpoint_dir: str,
):
    """A3 producer side as a streaming sink (the Bot's Kafka write)."""
    return (
        encode_messages(messages)
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint_dir)
    )
