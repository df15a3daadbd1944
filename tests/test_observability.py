"""In-plan streaming metrics (observe + listener): the observed ingest
counters must match the data pushed through the decode path, on both
the streaming and batch variants, without changing the output relation."""

from __future__ import annotations

import json

import pytest

from twitch_chat_analyser_spark.sources import kafka as ks
from twitch_chat_analyser_spark.streaming import observability as obs


def _wire(ts, ch="c", user="u", msg="m") -> bytes:
    return json.dumps(
        {"timestamp": ts, "channel": ch, "username": user, "message": msg}
    ).encode()


def test_decode_with_metrics_output_equals_plain_decode(spark):
    values = [_wire(1), b"{broken", _wire(2), _wire(3, msg="Kappa")]
    df = spark.createDataFrame([(v,) for v in values], "value binary")
    a = sorted(
        ks.decode_messages(df).collect(), key=lambda r: r["timestamp"]
    )
    b = sorted(
        obs.decode_with_metrics(df).collect(),
        key=lambda r: r["timestamp"],
    )
    assert a == b


def test_streaming_observed_metrics_count_records_and_malformed(
    spark, tmp_path
):
    src = str(tmp_path / "wire")
    sink_name = "obs_sink"
    values = [_wire(i * 1000) for i in range(1, 21)] + [
        b"not json",
        json.dumps({"timestamp": 99}).encode(),  # missing fields
    ]
    spark.createDataFrame([(v,) for v in values], "value binary").write.mode(
        "overwrite"
    ).parquet(src)

    listener = obs.ObservedMetricsListener()
    spark.streams.addListener(listener)
    try:
        stream = spark.readStream.schema("value binary").parquet(src)
        decoded = obs.decode_with_metrics(stream)
        q = (
            decoded.writeStream.format("memory")
            .queryName(sink_name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)
        # progress events are async; poll for the totals
        assert listener.wait_for(22), listener.batches
        totals = listener.totals()
        assert totals == {"records": 22, "malformed": 2}
        # event-time bounds come from VALID rows only
        assert min(b["min_ts"] for b in listener.batches) == 1000
        assert max(b["max_ts"] for b in listener.batches) == 20000
        # the observe node must not change the relation
        out = spark.sql(f"SELECT count(*) n FROM {sink_name}").collect()
        assert out[0]["n"] == 20
    finally:
        spark.streams.removeListener(listener)
        for q in spark.streams.active:
            if q.name == sink_name:
                q.stop()


def test_listener_reports_watermark_drops_and_state_size(spark, tmp_path):
    """stateOperators health: a row older than the advanced watermark is
    dropped by the stateful aggregation and surfaces through the
    listener's state_progress (observe() can never see it — it dies
    before the sink)."""
    import datetime as dt

    from pyspark.sql import functions as F

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def run_once(rows):
        spark.createDataFrame(rows, "ts timestamp, v int").coalesce(
            1
        ).write.mode("append").parquet(src)
        stream = spark.readStream.schema("ts timestamp, v int").parquet(src)
        q = (
            stream.withWatermark("ts", "10 seconds")
            .groupBy(F.window("ts", "10 seconds"))
            .count()
            .writeStream.outputMode("update")
            .format("noop")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)

    listener = obs.ObservedMetricsListener()
    spark.streams.addListener(listener)
    try:
        # batch 1 advances the watermark to t0+60s-10s
        run_once([(t0, 1), (t0 + dt.timedelta(seconds=60), 1)])
        # batch 2 (same checkpoint): one on-time row + one row far
        # behind the persisted watermark -> dropped and counted
        run_once(
            [
                (t0 + dt.timedelta(seconds=70), 1),
                (t0 - dt.timedelta(hours=1), 1),
            ]
        )
        import time

        deadline = time.monotonic() + 30
        while time.monotonic() < deadline:
            if any(
                p["dropped_by_watermark"] >= 1
                for p in listener.state_progress
            ):
                break
            time.sleep(0.2)
        assert any(
            p["dropped_by_watermark"] >= 1 for p in listener.state_progress
        ), listener.state_progress
        assert any(p["state_rows"] >= 1 for p in listener.state_progress)
    finally:
        spark.streams.removeListener(listener)


def test_observe_adds_no_shuffle(spark):
    # the metrics must ride the existing plan: observing the decode adds
    # no Exchange to a plan that had none
    import contextlib
    import io

    df = spark.createDataFrame([(_wire(1),)], "value binary")

    def plan_of(d):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            d.explain("formatted")
        return buf.getvalue()

    base = plan_of(ks.decode_messages(df))
    observed = plan_of(obs.decode_with_metrics(df))
    assert "Exchange" not in base
    assert "Exchange" not in observed
