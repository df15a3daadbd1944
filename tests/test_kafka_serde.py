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


# ---------------------------------------------------------------------------
# A1 reader construction, driven END-TO-END: "kafka" is a reserved
# provider name and the connector jar/broker don't exist in this image,
# so the kafka_stub wire twin (a Python DataSource emitting the
# connector's EXACT record schema and wire-format bytes) lets
# kafka_message_stream build its real reader plan — same options, same
# downstream decode — and run it.
# ---------------------------------------------------------------------------

from twitch_chat_analyser_spark.sources.kafka_stub import (
    WIRE_ROWS,
    register as _register_stub,
)


def _kafka_stub_stream(spark):
    return ks.kafka_message_stream(
        spark, "stub:9092", "chat", source_format="kafka_stub"
    )


def test_stub_resumes_from_partial_offset():
    """A restart from a mid-topic checkpoint replays the REMAINING
    records — the stub must not silently drop them."""
    from twitch_chat_analyser_spark.sources.kafka_stub import (
        KafkaStubStreamReader,
        wire_records,
    )

    reader = KafkaStubStreamReader()
    all_recs = wire_records()
    recs, end = reader.read({"offset": 1})
    assert recs == all_recs[1:]
    assert end == {"offset": len(all_recs)}
    # caught up: nothing more to emit
    recs2, end2 = reader.read(end)
    assert recs2 == [] and end2 == end


def test_kafka_reader_plan_runs_end_to_end(spark):
    """A1: the reader plan kafka_message_stream constructs is runnable
    and yields the normalized message relation — options validated
    source-side, malformed record dropped, epoch-ms decoded."""
    _register_stub(spark)
    stream = _kafka_stub_stream(spark)
    assert stream.isStreaming
    assert [f.name for f in stream.schema] == [
        "ts", "timestamp", "channel", "username", "message"
    ]
    got = []
    q = (
        stream.writeStream.foreachBatch(
            lambda df, bid: got.extend(
                tuple(r)
                for r in df.select(
                    "timestamp", "channel", "username", "message"
                ).collect()
            )
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert sorted(got) == [
        (1704067200000, "click", "u1", "spark join"),
        (1704067210000, "view", "u2", "fast merge"),
    ]


def test_kafka_stream_drives_fact_pipeline_like_file_twin(spark):
    """The decoded Kafka stream is a drop-in for the file twin: the SAME
    fact transform (channel_stats) over the stub Kafka stream produces
    exactly the batch aggregation of the same wire messages — the
    stream/batch duality the file-source tests pin, over the Kafka leaf."""
    from twitch_chat_analyser_spark.operators import aggregations as agg

    _register_stub(spark)
    stats = agg.channel_stats(_kafka_stub_stream(spark))
    got = []
    q = (
        stats.writeStream.outputMode("update")
        .foreachBatch(
            lambda df, bid: got.extend(tuple(r) for r in df.collect())
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wire = [json.dumps(r).encode() for r in WIRE_ROWS]
    expected = agg.channel_stats(
        ks.decode_messages(_kafka_frame(spark, wire))
    ).collect()
    assert sorted(got) == sorted(tuple(r) for r in expected)


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
