"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

Implementation lives in ``twitch_chat_analyser_spark``; this module is a
thin re-export. The events->messages mapping (FIXTURES.md §4) is
documented in ``twitch_chat_analyser_spark/ingest.py``: timestamp :=
epoch_ms(events.ts), channel := event_type, username := 'user_'||user_id,
message := documents.text joined on doc_id = event_id % 500.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from twitch_chat_analyser_spark import dims, facts, ingest, registry
from twitch_chat_analyser_spark.operators import aggregations


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: per-channel message
    counts in 15-min tumbling windows (the reference's ``channel_stats``
    fact table, ChannelStatsAggregation.java:29-42)."""
    msgs = ingest.messages(spark, "/root/testdata/sf0.001")
    return aggregations.channel_stats(msgs).orderBy("channel", "timestamp")


def _served(fn: Callable[[SparkSession, str], DataFrame]):
    """Run the query against the materialized shared facts (facts.warm):
    the reference's read path queries fact tables its write path
    maintains — it never re-derives them from raw messages per request.
    Cache substitution is plan-based, so `fn` itself is unchanged."""

    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        facts.warm(spark, sf_dir)
        return fn(spark, sf_dir)

    return wrapped


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _served(fn) for name, fn in registry.queries().items()}


def oracle_sql() -> dict[str, str]:
    return registry.oracle_sql()
