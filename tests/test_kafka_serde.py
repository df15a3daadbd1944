"""Wire-format serde tests (A1-A3): the JSON round-trip matches the
reference's Message.toJson/fromJson (Message.java:26-43) and the
producer record shape (Bot.java:136)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from twitch_chat_analyser_spark.sources import kafka as ks


def _kafka_frame(spark, values: list[bytes]):
    return spark.createDataFrame([(v,) for v in values], "value binary")


def test_decode_matches_reference_wire_format(spark):
    wire = json.dumps(
        {
            "timestamp": 1704067200123,
            "channel": "click",
            "username": "u1",
            "message": "Kappa hello",
        }
    ).encode()
    row = ks.decode_messages(_kafka_frame(spark, [wire])).collect()[0]
    assert row.timestamp == 1704067200123
    assert row.ts.isoformat().startswith("2024-01-01T00:00:00.123")
    assert (row.channel, row.username, row.message) == ("click", "u1", "Kappa hello")


def test_decode_drops_malformed_and_incomplete(spark):
    good = json.dumps(
        {"timestamp": 1, "channel": "c", "username": "u", "message": "m"}
    ).encode()
    bad_json = b"{not json"
    missing_field = json.dumps({"timestamp": 2, "channel": "c"}).encode()
    out = ks.decode_messages(
        _kafka_frame(spark, [good, bad_json, missing_field])
    ).collect()
    assert len(out) == 1 and out[0].timestamp == 1


def test_encode_decode_round_trip(spark):
    msgs = spark.createDataFrame(
        [
            (1704067200000, "click", "u1", "hello Kappa"),
            (1704067201500, "view", "u2", "PogChamp  x"),
        ],
        "timestamp long, channel string, username string, message string",
    )
    encoded = ks.encode_messages(msgs)
    # producer record key = epoch millis rendered as a string (Bot.java:136)
    keys = [r.key.decode() for r in encoded.select("key").collect()]
    assert sorted(keys) == ["1704067200000", "1704067201500"]
    back = (
        ks.decode_messages(encoded)
        .select("timestamp", "channel", "username", "message")
        .collect()
    )
    assert sorted(map(tuple, back)) == sorted(map(tuple, msgs.collect()))


def test_encode_derives_millis_from_ts_when_absent(spark):
    msgs = spark.sql(
        "SELECT timestamp_millis(1704067200123) AS ts, 'c' AS channel,"
        " 'u' AS username, 'm' AS message"
    )
    val = json.loads(ks.encode_messages(msgs).collect()[0].value)
    assert val["timestamp"] == 1704067200123


def test_serde_is_codegen_only(spark):
    """The serde must stay JVM-side: no BatchEvalPython / python UDF
    nodes in the plan."""
    msgs = spark.createDataFrame(
        [(1, "c", "u", "m")],
        "timestamp long, channel string, username string, message string",
    )
    plan = (
        ks.decode_messages(ks.encode_messages(msgs))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan
