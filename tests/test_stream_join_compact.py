"""Stream-stream interval join (batch/stream duality) and serving-store
compaction."""

from __future__ import annotations

import datetime as dt
import glob
import os

import pytest
from pyspark.sql import functions as F

from twitch_chat_analyser_spark import storage
from twitch_chat_analyser_spark.operators import temporal
from twitch_chat_analyser_spark.streaming import joins

EPOCH = dt.datetime(2024, 1, 1, 0, 0, 0, tzinfo=dt.timezone.utc)


def _mk_events(spark, rows):
    # rows: (event_id, ms, user_id, event_type)
    return spark.createDataFrame(
        [
            (eid, EPOCH + dt.timedelta(milliseconds=ms), uid, etype, 1.0, "{}")
            for eid, ms, uid, etype in rows
        ],
        joins.EVENT_SCHEMA,
    )


EVENTS = [
    (1, 0, 7, "click"),
    (2, 60_000, 7, "click"),
    (3, 120_000, 7, "purchase"),       # joins clicks 1 and 2
    (4, 2_000_000, 7, "purchase"),     # > horizon after both clicks: no match
    (5, 1_999_000, 7, "click"),        # 1s before purchase 4
    (6, 50_000, 9, "click"),           # other user: never joins user 7
    (7, 100_000, 9, "view"),
]


def test_stream_join_equals_batch(spark, tmp_path):
    src, out, ckpt = (
        str(tmp_path / "src"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    ev = _mk_events(spark, EVENTS)
    ev.coalesce(1).write.parquet(src)

    q = joins.start_click_attribution_stream(spark, src, out, ckpt)
    q.awaitTermination()
    got = sorted(
        tuple(r)
        for r in spark.read.parquet(os.path.join(out, "click_attribution")).collect()
    )

    batch = temporal.click_attribution(
        ev.select("event_id", "user_id", "event_type", F.unix_millis("ts").alias("ms"))
    )
    expected = sorted(
        (r["purchase_event_id"], r["user_id"], r["purchase_ms"],
         r["click_event_id"], r["click_ms"], r["lag_ms"])
        for r in batch.collect()
    )
    assert got == expected
    # sanity on the semantics themselves
    pairs = {(p, c) for p, _, _, c, _, _ in got}
    assert pairs == {(3, 1), (3, 2), (4, 5)}


def test_stream_join_is_incremental_across_batches(spark, tmp_path):
    src, out, ckpt = (
        str(tmp_path / "src"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    first, second = EVENTS[:3], EVENTS[3:]
    _mk_events(spark, first).coalesce(1).write.mode("append").parquet(src)
    joins.start_click_attribution_stream(spark, src, out, ckpt).awaitTermination()
    _mk_events(spark, second).coalesce(1).write.mode("append").parquet(src)
    joins.start_click_attribution_stream(spark, src, out, ckpt).awaitTermination()

    got = {
        (r["purchase_event_id"], r["click_event_id"])
        for r in spark.read.parquet(os.path.join(out, "click_attribution")).collect()
    }
    assert got == {(3, 1), (3, 2), (4, 5)}


def test_compact_reduces_files_and_preserves_rows(spark, tmp_path):
    path = str(tmp_path / "tbl")
    df = spark.range(0, 10_000).select(
        (F.col("id") % 50).alias("channel"), F.col("id").alias("timestamp")
    )
    df.repartition(64).write.parquet(path)
    before = len(glob.glob(os.path.join(path, "*.parquet")))
    assert before >= 32

    n_files = storage.compact(
        spark, path, target_rows_per_file=5_000,
        sort_within_by=["channel", "timestamp"],
    )
    after = glob.glob(os.path.join(path, "*.parquet"))
    assert len(after) == n_files == 2

    back = spark.read.parquet(path)
    assert back.count() == 10_000
    assert back.agg(F.sum("timestamp")).first()[0] == sum(range(10_000))
    # range clustering: each file owns a disjoint channel range
    per_file = (
        back.select("channel", F.input_file_name().alias("f"))
        .groupBy("f")
        .agg(F.min("channel").alias("lo"), F.max("channel").alias("hi"))
        .collect()
    )
    spans = sorted((r["lo"], r["hi"]) for r in per_file)
    for (_, hi1), (lo2, _) in zip(spans, spans[1:]):
        assert hi1 <= lo2
