"""Streaming Markov maintenance: stream == batch under per-user
monotone arrival, cross-batch boundary pairs counted, replay no-op."""

from __future__ import annotations

import pyspark.sql.functions as F

from twitch_chat_analyser_spark.operators import behavior
from twitch_chat_analyser_spark.streaming import markov

SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _rows(spark, rows, id0=0):
    return spark.createDataFrame(
        [
            (id0 + i, ts, u, t, 0.0, "{}")
            for i, (ts, u, t) in enumerate(rows)
        ],
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))


def _collect(df):
    return sorted(
        (r["src_type"], r["dst_type"], r["transitions"], r["src_total"],
         r["prob_ppm"])
        for r in df.collect()
    )


def test_stream_equals_batch_with_cross_batch_boundary(spark, tmp_path):
    # user 1's sequence SPANS the batch boundary: view(b1) -> click(b2)
    # must be counted exactly once, via the last-event store
    b1 = [
        ("2024-01-01 10:00:01", 1, "view"),
        ("2024-01-01 10:00:02", 2, "view"),
        ("2024-01-01 10:00:03", 2, "buy"),
    ]
    b2 = [
        ("2024-01-01 10:00:04", 1, "click"),
        ("2024-01-01 10:00:05", 1, "view"),
    ]
    src = str(tmp_path / "src")
    d1, d2 = _rows(spark, b1, 0), _rows(spark, b2, 100)
    d1.coalesce(1).write.mode("append").parquet(src)
    d2.coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    tdir, ldir = str(tmp_path / "trans"), str(tmp_path / "last")
    q = markov.start_markov_pipeline(
        spark, stream, tdir, ldir, str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)

    got = _collect(markov.serve_transitions(spark, tdir))
    want = _collect(behavior.markov_transitions(d1.unionByName(d2)))
    assert got == want
    # the boundary pair itself is present
    assert any(s == "view" and d == "click" for s, d, *_ in got)


def test_replayed_batch_is_noop_on_both_stores(spark, tmp_path):
    rows = [("2024-01-01 10:00:01", 1, "view"),
            ("2024-01-01 10:00:02", 1, "click")]
    df = _rows(spark, rows)
    tdir, ldir = str(tmp_path / "trans"), str(tmp_path / "last")
    markov.process_batch(spark, df, tdir, ldir, batch_id=0)
    first = _collect(markov.serve_transitions(spark, tdir))
    last1 = sorted(map(tuple, spark.read.parquet(ldir).collect()))
    markov.process_batch(spark, df, tdir, ldir, batch_id=0)  # replay
    assert _collect(markov.serve_transitions(spark, tdir)) == first
    assert sorted(map(tuple, spark.read.parquet(ldir).collect())) == last1


def test_incremental_equals_full_over_three_batches(spark, tmp_path):
    batches = [
        [("2024-01-01 10:00:01", 7, "a"), ("2024-01-01 10:00:02", 7, "b")],
        [("2024-01-01 10:00:03", 7, "a")],
        [("2024-01-01 10:00:04", 7, "b"), ("2024-01-01 10:00:05", 7, "b")],
    ]
    tdir, ldir = str(tmp_path / "trans"), str(tmp_path / "last")
    full = None
    for i, rows in enumerate(batches):
        df = _rows(spark, rows, id0=i * 10)
        markov.process_batch(spark, df, tdir, ldir, batch_id=i)
        full = df if full is None else full.unionByName(df)
    got = _collect(markov.serve_transitions(spark, tdir))
    want = _collect(behavior.markov_transitions(full))
    assert got == want
