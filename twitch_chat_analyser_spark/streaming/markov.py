"""Streaming Markov-transition maintenance: the continuous twin of
``behavior.markov_transitions``.

Two journaled stores make the sequence computation incremental:

- ``last_event/`` — one row per user: the (ts, event_id, event_type)
  struct-MAX of everything seen (the same mergeable-order-statistic
  trick as streaming/ohlc.py's open/close).
- ``transitions/`` — additive (src_type, dst_type) counts, maintained
  with streaming.pipeline.additive_merge.

Per micro-batch: within-batch adjacent pairs come from the batch's own
per-user lead window (batch/stream duality); the ONE cross-batch pair
per active user comes from joining the user's stored last event to the
batch's first event. Contract: per-user MONOTONE arrival (each user's
events arrive in (ts, event_id) order across batches) — the standard
log-ingestion assumption; an out-of-order straggler would need a
re-sort no per-user-constant state can provide, which is exactly why
the batch operator exists for reprocessing.

Replay safety: both stores journal applied batch ids behind one atomic
swap each; a replayed micro-batch is a no-op on both.

Scale: state is ONE ROW PER USER (bounded by the user dimension, not
the stream), transitions are |types|^2 rows; the per-batch plan is one
user-partitioned window + one user-keyed join against the store.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .pipeline import additive_merge
from .storeswap import recover, swap_in


def _applied(path: str) -> set[int]:
    j = os.path.join(path, "_applied_batches.json")
    if os.path.isfile(j):
        with open(j) as fh:
            return set(json.load(fh))
    return set()


def _batch_last_events(events: DataFrame) -> DataFrame:
    """Per-user (ts, event_id, event_type) struct-max of the batch."""
    key = F.struct(
        F.col("ts").alias("ts"),
        F.col("event_id").alias("event_id"),
        F.col("event_type").alias("event_type"),
    )
    return events.groupBy("user_id").agg(F.max(key).alias("last"))


def process_batch(
    spark: SparkSession,
    events: DataFrame,
    transitions_dir: str,
    last_dir: str,
    batch_id: int,
) -> None:
    """One micro-batch: in-batch pairs + store-boundary pairs into the
    additive transition store; then struct-max merge the last-event
    store. Idempotent per batch id on both stores; ``recover`` first
    makes any torn swap whole on BOTH stores (storeswap.py) —
    additive_merge uses the same .tmp-*/.old-* naming, so a crash
    between its two renames is restored here before the batch reads
    the store (otherwise transitions would silently rebuild from
    empty and lose the applied-batch journal with the history)."""
    recover(last_dir)
    recover(transitions_dir)
    events = events.select("user_id", "ts", "event_id", "event_type").cache()
    try:
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        in_batch = (
            events.withColumn("dst_type", F.lead("event_type").over(w))
            .filter(F.col("dst_type").isNotNull())
            .select(F.col("event_type").alias("src_type"), "dst_type")
        )
        wf = Window.partitionBy("user_id").orderBy(
            F.asc("ts"), F.asc("event_id")
        )
        first = (
            events.withColumn("rn", F.row_number().over(wf))
            .filter("rn = 1")
            .select("user_id", F.col("event_type").alias("dst_type"))
        )
        if os.path.isdir(last_dir):
            prev = spark.read.parquet(last_dir).select(
                "user_id", F.col("last.event_type").alias("src_type")
            )
            boundary = first.join(prev, "user_id").select(
                "src_type", "dst_type"
            )
            pairs = in_batch.unionByName(boundary)
        else:
            pairs = in_batch
        deltas = pairs.groupBy("src_type", "dst_type").agg(
            F.count("*").cast("long").alias("transitions")
        )
        additive_merge(
            spark, transitions_dir, deltas,
            ["src_type", "dst_type"], "transitions", batch_id,
        )

        applied = _applied(last_dir)
        if batch_id in applied:
            return
        batch_last = _batch_last_events(events)
        if os.path.isdir(last_dir):
            old = spark.read.parquet(last_dir)
            merged = (
                old.unionByName(batch_last)
                .groupBy("user_id")
                .agg(F.max("last").alias("last"))
            )
        else:
            merged = batch_last
        swap_in(merged, last_dir, applied | {batch_id})
    finally:
        events.unpersist()


def serve_transitions(spark: SparkSession, transitions_dir: str) -> DataFrame:
    """Store -> the public schema of behavior.markov_transitions.

    Restore-only recovery first (never deletes an in-flight writer's
    tmp dir — storeswap.recover(restore_only=True))."""
    recover(transitions_dir, restore_only=True)
    t = spark.read.parquet(transitions_dir)
    wsrc = Window.partitionBy("src_type")
    return t.select(
        "src_type",
        "dst_type",
        "transitions",
        F.sum("transitions").over(wsrc).cast("long").alias("src_total"),
    ).withColumn(
        "prob_ppm",
        F.expr(
            "CAST((CAST(transitions AS DECIMAL(38,0)) * 2000000"
            " + src_total) DIV (2 * CAST(src_total AS DECIMAL(38,0)))"
            " AS BIGINT)"
        ),
    )


def start_markov_pipeline(
    spark: SparkSession,
    events_stream: DataFrame,
    transitions_dir: str,
    last_dir: str,
    checkpoint_dir: str,
    trigger: dict | None = None,
):
    def sink(batch_df: DataFrame, batch_id: int) -> None:
        process_batch(spark, batch_df, transitions_dir, last_dir, batch_id)

    return (
        events_stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )
