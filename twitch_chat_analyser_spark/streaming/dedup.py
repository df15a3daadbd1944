"""Streaming ingest deduplication (`dropDuplicatesWithinWatermark`).

The reference's ingest is at-least-once ABOVE the Kafka log: the bot's
producer retries can write a chat message twice (Bot.java:136 —
fire-and-forget send, no idempotent-producer config), and every
downstream count would then be inflated; the reference simply accepts
this. Spark closes the gap natively: watermark-scoped streaming
deduplication keeps one row per wire-identity key and expires dedup
state once the watermark passes — bounded memory, unlike a naive
`dropDuplicates` on a stream whose state grows forever.

Semantics: two records are duplicates when all four wire fields match
(Message.java:11-14 — there is no producer-assigned message id). State
per key lives until `watermark_delay` behind the max seen event time;
a duplicate arriving later than that is NOT caught (the price of
bounded state — at-least-once producers retry within seconds, so a
minutes-scale delay is orders of magnitude of slack).

Batch counterpart: plain `dropDuplicates(KEYS)` — same key set, so a
backfill over a dumped topic and the live stream agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from .pipeline import read_message_stream

# Wire-identity of a message (Message.java:11-14): no synthetic id
# exists, the full record is the key.
DEDUP_KEYS = ["ts", "channel", "username", "message"]


def dedup_messages(messages: DataFrame) -> DataFrame:
    """Batch/backfill variant: exact dedup on the wire identity."""
    return messages.dropDuplicates(DEDUP_KEYS)


def dedup_messages_stream(
    stream: DataFrame, watermark_delay: str = "10 minutes"
) -> DataFrame:
    """Streaming variant with bounded state: dedup state for a key is
    dropped once the watermark (max event time - delay) passes it."""
    return stream.withWatermark("ts", watermark_delay).dropDuplicatesWithinWatermark(
        DEDUP_KEYS
    )


def start_dedup_stream(
    spark: SparkSession,
    source_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    watermark_delay: str = "10 minutes",
) -> StreamingQuery:
    """File-source → watermarked dedup → append parquet. The cleaned
    stream is what the five fact pipelines would consume in a
    duplicate-hostile deployment."""
    stream = read_message_stream(spark, source_dir)
    clean = dedup_messages_stream(stream, watermark_delay)
    return (
        clean.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
