"""Streaming register-store maintenance for the portable HLL: stream
result equals batch result bit-for-bit, replays are no-ops by the max
algebra, and rollups re-merge stored registers exactly."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from twitch_chat_analyser_spark.operators import sketches
from twitch_chat_analyser_spark.streaming import hll as shll
from twitch_chat_analyser_spark.streaming.pipeline import read_message_stream

SCHEMA = "ts string, channel string, username string, message string"


def _messages(spark, n_users: int, channels=("a", "b")):
    rows = [
        (f"2024-01-0{1 + (i % 7)} 10:00:00", c, f"u{c}{i}", "hi")
        for c in channels
        for i in range(n_users)
        for _ in range(2)  # duplicates must not move registers
    ]
    return spark.createDataFrame(rows, SCHEMA).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )


def _run_stream(spark, src_dir, store, ckpt):
    q = shll.start_hll_maintenance(
        spark,
        read_message_stream(spark, src_dir, max_files_per_trigger=2),
        store,
        ckpt,
    )
    q.awaitTermination()


def test_streamed_store_equals_batch_estimate_exactly(spark, tmp_path):
    msgs = _messages(spark, 80)
    src = str(tmp_path / "src")
    msgs.repartition(8).write.parquet(src)  # 8 files -> 4 micro-batches
    store = str(tmp_path / "store")
    _run_stream(spark, src, store, str(tmp_path / "ckpt"))

    streamed = {
        r["channel"]: r["hll_est"]
        for r in shll.serve_estimates(spark, store).collect()
    }
    batch = {
        r["channel"]: r["hll_est"]
        for r in sketches.hll_estimate(sketches.hll_registers(msgs)).collect()
    }
    assert streamed == batch  # bit-for-bit, any batching
    # and the store holds registers, not users: <= m rows per channel
    n_rows = spark.read.parquet(store).count()
    assert n_rows <= 2 * sketches.HLL_M


def test_replayed_batch_is_a_noop_by_algebra(spark, tmp_path):
    msgs = _messages(spark, 40, channels=("a",))
    store = str(tmp_path / "store")
    regs = sketches.hll_registers(msgs)
    shll.merge_registers(spark, store, regs, ["channel"])
    once = sorted(map(tuple, spark.read.parquet(store).collect()))
    shll.merge_registers(spark, store, regs, ["channel"])  # replay
    assert sorted(map(tuple, spark.read.parquet(store).collect())) == once


def test_incremental_merge_equals_full_corpus(spark, tmp_path):
    first = _messages(spark, 50)
    second = _messages(spark, 120)  # superset user ids 0..119
    store = str(tmp_path / "store")
    shll.merge_registers(spark, store, sketches.hll_registers(first), ["channel"])
    shll.merge_registers(spark, store, sketches.hll_registers(second), ["channel"])
    inc = {
        r["channel"]: r["hll_est"]
        for r in shll.serve_estimates(spark, store).collect()
    }
    full = {
        r["channel"]: r["hll_est"]
        for r in sketches.hll_estimate(
            sketches.hll_registers(first.unionByName(second))
        ).collect()
    }
    assert inc == full


def test_rollup_re_merges_stored_registers(spark, tmp_path):
    """Coarser grouping (all channels) from the per-channel store: merge
    registers across channels, never re-reading events — and distinct
    counts do NOT sum (shared users), which the register merge handles."""
    msgs = _messages(spark, 60)  # same 60 user ids in both channels? no:
    # usernames embed the channel, so the union is 120 distinct
    store = str(tmp_path / "store")
    shll.merge_registers(spark, store, sketches.hll_registers(msgs), ["channel"])
    regs = spark.read.parquet(store).withColumn("scope", F.lit("all"))
    rollup = sketches.hll_estimate(
        regs.groupBy("scope", "reg").agg(F.max("mrho").alias("mrho")),
        ["scope"],
    ).collect()[0]
    direct = sketches.hll_estimate(
        sketches.hll_registers(msgs.withColumn("scope", F.lit("all")), ["scope"]),
        ["scope"],
    ).collect()[0]
    assert rollup["hll_est"] == direct["hll_est"]
    assert os.path.isdir(store)
