"""Streaming KMV sketch maintenance: per-channel k-minimum-values
distinct sketches kept current per micro-batch — the set-operation
counterpart of streaming/hll.py's register store (union/intersection
estimates over time, not just distinct counts).

Merge algebra: the store holds each channel's k smallest DISTINCT
hash values; merging a batch is ``bottom-k(distinct(store ∪ batch))``.
That operation is idempotent and commutative on sets, so A REPLAYED
MICRO-BATCH IS A NO-OP BY ALGEBRA — no applied-batch journal is needed
(same argument as the HLL max-merge store). The swap is still atomic
(tmp + rename) so a crash mid-write never mixes states.

State: <= k BIGINT rows per channel, forever — bounded by the channel
dimension, never by the stream. Per-trigger cost: the batch's own
distinct + bottom-k window, plus one union/re-window against only the
channels PRESENT in the batch (the store side is filtered by a
left-semi join first, so untouched channels' rows are carried over
without re-sorting).

Serving: sketches.kmv_overlap_from_sketch over the store gives the
live pairwise audience-overlap estimates; per-channel distinct
estimates come from the same CASE/divide expressions as the batch
operator (bit-identical math).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.sketches import (
    KMV_K,
    _kmv_est,
    kmv_kmin,
    kmv_overlap_from_sketch,
)
from .storeswap import recover, swap_in


def merge_kmv(
    spark: SparkSession, path: str, batch: DataFrame, k: int = KMV_K
) -> None:
    """Merge one micro-batch of messages into the k-min store
    (``recover`` first makes any torn swap whole)."""
    recover(path)
    delta = kmv_kmin(batch, k).cache()
    try:
        if os.path.isdir(path):
            store = spark.read.parquet(path)
            touched = delta.select("channel").distinct()
            hot = store.join(F.broadcast(touched), "channel", "left_semi")
            cold = store.join(F.broadcast(touched), "channel", "left_anti")
            w = Window.partitionBy("channel").orderBy("hv")
            merged_hot = (
                hot.unionByName(delta)
                .distinct()
                .withColumn("r", F.row_number().over(w))
                .filter(F.col("r") <= k)
                .select("channel", "hv")
            )
            merged = merged_hot.unionByName(cold)
        else:
            merged = delta
        swap_in(merged, path)
    finally:
        delta.unpersist()


def serve_estimates(
    spark: SparkSession, path: str, k: int = KMV_K
) -> DataFrame:
    """Store -> per-channel distinct estimate (same expression tree as
    the batch operator, so stream==batch is bit-for-bit). Quantized to
    a milli-unit BIGINT — no derived DOUBLE in a hashable serving
    output (float sweep, round 7).

    -> channel, est_milli
    """
    recover(path, restore_only=True)
    sk = spark.read.parquet(path)
    return (
        sk.groupBy("channel")
        .agg(F.count("*").alias("n"), F.max("hv").alias("hk"))
        .select(
            "channel",
            F.round(_kmv_est(F.col("n"), F.col("hk"), k) * 1000, 0)
            .cast("long")
            .alias("est_milli"),
        )
    )


def serve_overlap(spark: SparkSession, path: str, k: int = KMV_K) -> DataFrame:
    """Store -> live pairwise audience-overlap estimates (the batch
    operator's pair stage over the maintained sketches). Restore-only:
    readers never delete a concurrent writer's tmp dir."""
    recover(path, restore_only=True)
    return kmv_overlap_from_sketch(spark.read.parquet(path), k)


def start_kmv_pipeline(
    spark: SparkSession,
    messages_stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    k: int = KMV_K,
    trigger: dict | None = None,
):
    def sink(batch_df: DataFrame, batch_id: int) -> None:
        merge_kmv(spark, out_dir, batch_df, k)

    return (
        messages_stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )
