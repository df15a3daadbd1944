"""JSON-lines / CSV message source round-trips and malformed-row
handling, plus the SQL view surface."""

from __future__ import annotations

from pyspark.sql import functions as F

from twitch_chat_analyser_spark.sources import files

ROWS = [
    (1_000, "click", "u1", "hello world"),
    (2_000, "view", "u2", "quoted, comma"),
]


def _wire(spark):
    return spark.createDataFrame(
        ROWS, "timestamp long, channel string, username string, message string"
    )


def _key(df):
    return sorted(
        (r["timestamp"], r["channel"], r["username"], r["message"])
        for r in df.collect()
    )


def test_json_round_trip(spark, tmp_path):
    p = str(tmp_path / "j")
    files.write_messages_json(_wire(spark), p)
    back = files.read_messages_json(spark, p)
    assert _key(back) == _key(_wire(spark))
    # event-time column is derived from the wire epoch-ms
    assert back.select(F.unix_millis("ts")).first()[0] in (1_000, 2_000)


def test_csv_round_trip_preserves_commas(spark, tmp_path):
    p = str(tmp_path / "c")
    files.write_messages_csv(_wire(spark), p)
    assert _key(files.read_messages_csv(spark, p)) == _key(_wire(spark))


def test_orc_round_trip(spark, tmp_path):
    p = str(tmp_path / "o")
    files.write_messages_orc(_wire(spark), p)
    assert _key(files.read_messages_orc(spark, p)) == _key(_wire(spark))


def test_malformed_json_rows_are_dropped(spark, tmp_path):
    p = tmp_path / "m"
    p.mkdir()
    (p / "part-0.json").write_text(
        '{"timestamp": 1000, "channel": "c", "username": "u", "message": "ok"}\n'
        "not json at all\n"
        '{"timestamp": 2000, "channel": "c"}\n'  # missing fields
    )
    out = files.read_messages_json(spark, str(p)).collect()
    assert len(out) == 1 and out[0]["message"] == "ok"


def test_json_streaming_source_feeds_aggregations(spark, tmp_path):
    from twitch_chat_analyser_spark.operators import aggregations as agg

    p = str(tmp_path / "s")
    files.write_messages_json(_wire(spark), p)
    stream = files.read_messages_json(spark, p, streaming=True)
    q = (
        agg.channel_stats(stream)
        .writeStream.format("memory")
        .queryName("json_cs")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["channel"], r["messages"])
        for r in spark.sql("SELECT * FROM json_cs").collect()
    }
    assert got == {("click", 1), ("view", 1)}


def test_sql_surface_answers_adhoc_queries(spark, sf_dir):
    from twitch_chat_analyser_spark.plans import sqlviews

    out = sqlviews.run_sql(
        spark,
        sf_dir,
        "SELECT channel, count(*) AS n FROM messages GROUP BY channel",
    ).collect()
    assert len(out) == 5 and all(r["n"] > 0 for r in out)
