"""Streaming OHLC candle maintenance: stream == batch for any batching,
late data lands in old buckets, replay is a no-op."""

from __future__ import annotations

import pyspark.sql.functions as F

from twitch_chat_analyser_spark.operators import temporal
from twitch_chat_analyser_spark.streaming import ohlc

SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _rows(spark, rows):
    return spark.createDataFrame(
        [
            (i, ts, 1, t, float(v), "{}")
            for i, (ts, t, v) in enumerate(rows)
        ],
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))


def _write_batches(spark, src_dir, batches):
    # one parquet file per batch + maxFilesPerTrigger=1 -> deterministic
    # micro-batch boundaries
    all_rows = []
    for i, rows in enumerate(batches):
        df = _rows(spark, rows)
        # preserve global event ids across batches
        df = df.withColumn(
            "event_id", F.col("event_id") + F.lit(i * 1000)
        )
        df.coalesce(1).write.mode("append").parquet(src_dir)
        all_rows.append(df)
    full = all_rows[0]
    for d in all_rows[1:]:
        full = full.unionByName(d)
    return full


def _run(spark, src_dir, out_dir, ckpt):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    q = ohlc.start_ohlc_pipeline(spark, stream, out_dir, ckpt)
    q.awaitTermination(120)


def test_stream_equals_batch_with_late_data(spark, tmp_path):
    b1 = [
        ("2024-01-01 10:05:00", "view", 10.0),
        ("2024-01-01 10:40:00", "view", 30.0),
        ("2024-01-01 11:10:00", "click", 7.0),
    ]
    # batch 2 includes a LATE event for the 10:00 bucket (arrives after
    # the bucket was first materialized) that becomes both new open
    # (earlier ts) and new high
    b2 = [
        ("2024-01-01 10:01:00", "view", 99.0),
        ("2024-01-01 11:20:00", "click", 3.0),
    ]
    src = str(tmp_path / "src")
    out = str(tmp_path / "candles")
    full = _write_batches(spark, src, [b1, b2])
    _run(spark, src, out, str(tmp_path / "ckpt"))

    got = {
        (r["event_type"], r["bucket_ms"]): (
            r["open"], r["high"], r["low"], r["close"], r["n_events"]
        )
        for r in ohlc.serve_candles(spark, out).collect()
    }
    want = {
        (r["event_type"], r["bucket_ms"]): (
            r["open"], r["high"], r["low"], r["close"], r["n_events"]
        )
        for r in temporal.ohlc_downsample(full).collect()
    }
    assert got == want
    # the late event rewrote the old bucket's open AND high
    view_10 = [v for (t, b), v in got.items() if t == "view"][0]
    assert view_10[0] == 99.0 and view_10[1] == 99.0


def test_replayed_batch_is_noop(spark, tmp_path):
    rows = [("2024-01-01 10:05:00", "view", 10.0)]
    src = str(tmp_path / "src")
    out = str(tmp_path / "candles")
    df = _write_batches(spark, src, [rows])
    delta = ohlc.ohlc_delta(df)
    ohlc.ohlc_merge(spark, out, delta, batch_id=0)
    first = sorted(map(tuple, ohlc.serve_candles(spark, out).collect()))
    # replaying the SAME batch id must change nothing (task retry twin)
    ohlc.ohlc_merge(spark, out, delta, batch_id=0)
    assert sorted(map(tuple, ohlc.serve_candles(spark, out).collect())) == first
    # a new batch id with the same data DOES double n_events (additive
    # count) while keeping the order statistics stable
    ohlc.ohlc_merge(spark, out, delta, batch_id=1)
    r = ohlc.serve_candles(spark, out).collect()[0]
    assert r["n_events"] == 2 and r["open"] == 10.0 and r["high"] == 10.0


def test_torn_swap_recovery_restores_history(spark, tmp_path):
    import os

    out = str(tmp_path / "candles")
    df = _rows(spark, [("2024-01-01 10:05:00", "view", 10.0)])
    ohlc.ohlc_merge(spark, out, ohlc.ohlc_delta(df), batch_id=0)
    before = sorted(map(tuple, ohlc.serve_candles(spark, out).collect()))
    os.rename(out, out + ".old-deadbeef")
    assert sorted(map(tuple, ohlc.serve_candles(spark, out).collect())) == before
    # the restored journal still suppresses a replay of batch 0
    ohlc.ohlc_merge(spark, out, ohlc.ohlc_delta(df), batch_id=0)
    assert sorted(map(tuple, ohlc.serve_candles(spark, out).collect())) == before
