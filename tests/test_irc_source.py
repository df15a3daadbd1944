"""Twitch IRC (TMI) wire-format source: PRIVMSG parse parity with the
reference bot's onMessage drops (Bot.java:113-129), encoder round-trip,
non-PRIVMSG traffic dropped, and the batch/streaming readers."""

from __future__ import annotations

from twitch_chat_analyser_spark.sources import irc

RAW_LINES = [
    # full tag-bearing PRIVMSG (the shape twitch4j consumes)
    "@badge-info=;badges=;color=#FF0000;tmi-sent-ts=1690000000123;"
    "user-type= :Some_User!some_user@some_user.tmi.twitch.tv "
    "PRIVMSG #ChannelA :Hello  world  Kappa",
    # no tags -> no tmi-sent-ts -> dropped (no event time)
    ":alice!alice@alice.tmi.twitch.tv PRIVMSG #chan :no tags here",
    # non-PRIVMSG traffic: all dropped
    "PING :tmi.twitch.tv",
    ":bob!bob@bob.tmi.twitch.tv JOIN #chan",
    ":tmi.twitch.tv 001 me :Welcome, GLHF!",
    "@tmi-sent-ts=1690000001000 :tmi.twitch.tv USERNOTICE #chan :sub!",
    # empty-after-trim message -> dropped (Bot.java:126-129)
    "@tmi-sent-ts=1690000002000 :u1!u1@u1.tmi.twitch.tv "
    "PRIVMSG #chan :   ",
    # message containing ':' and '#: parsed verbatim after the first ':'
    "@tmi-sent-ts=1690000003000 :u2!u2@u2.tmi.twitch.tv "
    "PRIVMSG #chan :see http://x.test/#frag :)",
    # garbage line
    "not irc at all",
]


def _parse(spark, lines):
    df = spark.createDataFrame([(x,) for x in lines], "value string")
    return {
        (r["timestamp"], r["channel"], r["username"], r["message"])
        for r in irc.parse_irc_lines(df).collect()
    }


def test_parse_privmsg_drops_and_normalization(spark):
    got = _parse(spark, RAW_LINES)
    assert got == {
        # trimmed message, lowercased channel + login
        (1690000000123, "channela", "some_user", "Hello  world  Kappa"),
        (1690000003000, "chan", "u2", "see http://x.test/#frag :)"),
    }


def test_parse_sets_event_time_from_tmi_sent_ts(spark):
    df = spark.createDataFrame([(RAW_LINES[0],)], "value string")
    row = irc.parse_irc_lines(df).collect()[0]
    assert row["timestamp"] == 1690000000123
    assert int(row["ts"].timestamp() * 1000) == 1690000000123


def test_encode_parse_round_trip_and_crlf_sanitize(spark):
    msgs = spark.createDataFrame(
        [
            (1000, "chan", "alice", "plain text"),
            (2000, "chan", "bob", "line\r\nbreaks\nbecome spaces"),
        ],
        "timestamp long, channel string, username string, message string",
    )
    out = {
        (r["timestamp"], r["channel"], r["username"], r["message"])
        for r in irc.parse_irc_lines(irc.encode_irc_lines(msgs)).collect()
    }
    assert out == {
        (1000, "chan", "alice", "plain text"),
        (2000, "chan", "bob", "line  breaks become spaces"),
    }


def test_batch_and_stream_readers_agree(spark, tmp_path):
    src = str(tmp_path / "irc_log")
    spark.createDataFrame(
        [(x,) for x in RAW_LINES], "value string"
    ).coalesce(1).write.mode("overwrite").text(src)

    batch = sorted(
        map(tuple, irc.read_messages_irc(spark, src).collect())
    )
    out = str(tmp_path / "out")
    q = (
        irc.read_messages_irc(spark, src, streaming=True)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = sorted(map(tuple, spark.read.parquet(out).collect()))
    assert batch == streamed and len(batch) == 2
