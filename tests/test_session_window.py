"""Built-in session_window: batch parity with the gaps-and-islands
operator, and streaming append-mode emission once the watermark passes a
session's close."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from twitch_chat_analyser_spark.operators import textops
from twitch_chat_analyser_spark.streaming import stateful

EPOCH = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
EVENTS_SCHEMA = "ts timestamp, user_id long, event_id long"
GAP_MS = 30 * 60 * 1000


def _mk(spark, rows):
    return spark.createDataFrame(
        [(EPOCH + dt.timedelta(minutes=m), u, e) for m, u, e in rows],
        EVENTS_SCHEMA,
    )


ROWS = [(0, 1, 10), (5, 1, 11), (90, 1, 12), (95, 1, 13), (0, 2, 20)]


def test_batch_session_window_matches_gaps_and_islands(spark):
    events = _mk(spark, ROWS)
    via_builtin = {
        (r.user_id, r.session_start_ms): r.n_events
        for r in stateful.session_window_counts(events, "30 minutes").collect()
    }
    via_islands = {
        (r.user_id, r.session_start_ms): r.n_events
        for r in textops.sessionize(events, gap_ms=GAP_MS).collect()
    }
    assert via_builtin == via_islands
    # session_window's end = last event + gap (bounds semantics differ
    # from duration; check one explicitly)
    end = {
        (r.user_id, r.session_start_ms): r.session_end_ms
        for r in stateful.session_window_counts(events, "30 minutes").collect()
    }
    first = EPOCH.timestamp() * 1000
    assert end[(1, int(first))] == int(first) + 5 * 60_000 + GAP_MS


def test_streaming_session_window_emits_on_watermark(spark, tmp_path):
    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    # file 1: two user-1 sessions' worth of early events + user 2
    _mk(spark, ROWS).coalesce(1).write.mode("append").parquet(src)
    # file 2: far-future event pushes the watermark past every session
    _mk(spark, [(600, 3, 30)]).coalesce(1).write.mode("append").parquet(src)
    # file 3: one more batch so the advanced watermark finalizes file-1
    # sessions (watermark updates BETWEEN micro-batches)
    _mk(spark, [(1200, 3, 31)]).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stateful.session_window_counts(stream, "30 minutes")
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = {
        (r.user_id, r.session_start_ms): r.n_events
        for r in spark.read.parquet(out).collect()
    }
    batch = {
        (r.user_id, r.session_start_ms): r.n_events
        for r in textops.sessionize(
            _mk(spark, ROWS + [(600, 3, 30)]), gap_ms=GAP_MS
        ).collect()
    }
    # every watermark-passed session emitted exactly once (file-1's and
    # file-2's); only file-3's final session is still open at
    # end-of-input
    assert got == batch
