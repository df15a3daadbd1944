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


def _bot_model(line: str):
    """Independent pure-Python model of Bot.java:113-129 over a
    correctly TOKENIZED TMI line (RFC1459 + IRCv3 message-tags): tags
    token ends at the first raw space (tag values escape ';'/' ' as
    '\\:'/'\\s', so within the token a raw ';' always separates tags),
    prefix is ':nick!...', command must be PRIVMSG, trailing begins at
    ' :'. Returns (ts_ms, channel, username, message) or None (drop).

    tmi-sent-ts semantics mirror the anchored regex exactly: the LAST
    tag named tmi-sent-ts whose value is a nonempty ASCII-digit run
    wins (the greedy `(?:[^ ]*;)?` prefix backtracks from the longest
    match — which is also IRCv3's duplicated-key rule: last wins).
    Message gets Java String.trim() (strips every char <= U+0020)."""
    import re as _re

    if not line.startswith("@"):
        return None
    sp = line.find(" ")
    if sp < 0:
        return None
    tags_tok, rest = line[1:sp], line[sp + 1 :]
    ts = None
    for t in tags_tok.split(";"):
        k, _, v = t.partition("=")
        if k == "tmi-sent-ts" and _re.fullmatch(r"[0-9]+", v):
            ts = int(v)  # no break: last valid duplicate wins
    if ts is None or not rest.startswith(":"):
        return None
    sp2 = rest.find(" ")
    if sp2 < 0:
        return None
    prefix, rest2 = rest[1:sp2], rest[sp2 + 1 :]
    nick = prefix.split("!", 1)[0]
    if "!" not in prefix or not _re.fullmatch(r"[A-Za-z0-9_]+", nick):
        return None
    if not rest2.startswith("PRIVMSG #"):
        return None
    chan_msg = rest2[len("PRIVMSG #") :]
    sp3 = chan_msg.find(" ")
    if sp3 <= 0 or not chan_msg[sp3 + 1 :].startswith(":"):
        return None
    channel, msg = chan_msg[:sp3], chan_msg[sp3 + 2 :]
    # Java String.trim(): strips chars <= U+0020 at both ends
    msg = msg.strip("".join(chr(c) for c in range(0x21)))
    if not channel or not msg:
        return None
    return (ts, channel.lower(), nick.lower(), msg)


def _adversarial_corpus() -> list[str]:
    """Real-shape + hostile TMI lines: full tag sets (badges,
    display-name with IRCv3 escapes, emotes= ranges, vendor tags),
    /me ACTION \\x01 framing, bodies that try to FORGE tags/prefixes/
    commands, whitespace-only and control-char-only messages, missing
    or malformed tmi-sent-ts, duplicate tags, bad logins (VERDICT r10
    task 4 + ADVICE: the round-trip oracle never exercises these
    shapes because the encoder can't emit them)."""
    import random

    rng = random.Random(0xC0FFEE)
    tagsets = [
        "tmi-sent-ts=1690000000123",
        "badge-info=subscriber/26;badges=subscriber/24,premium/1;"
        "color=#B22222;display-name=Some\\sUser;emotes=25:0-4,12-16;"
        "first-msg=0;flags=;id=b34cb0f4;mod=0;room-id=12345;"
        "subscriber=1;tmi-sent-ts=1690000000123;turbo=0;"
        "user-id=67890;user-type=",
        # vendor tag + escaped ';' (raw ':' legal in values)
        "client-nonce=abc123;+example.com/vendor=x\\:y;"
        "tmi-sent-ts=1690000000123;reply-parent-msg-body=hi\\sthere",
        # value with raw ':' and '!' and 'PRIVMSG #' forged INSIDE a
        # tag value is impossible on the wire (raw space ends the
        # token) — but ':' and '!' are legal:
        "display-name=a:b!c;emotes=1:0-1/2:3-4;tmi-sent-ts=1690000000123",
        # missing tmi-sent-ts entirely
        "badges=;color=",
        # empty, non-digit, and trailing-junk ts values
        "tmi-sent-ts=",
        "tmi-sent-ts=16x9",
        "tmi-sent-ts=123abc",
        # empty first value then a digit duplicate later (regex and
        # model must agree: LAST valid occurrence wins, per IRCv3)
        "tmi-sent-ts=;x=1;tmi-sent-ts=1690000000999",
        "tmi-sent-ts=111;tmi-sent-ts=222",
        # key-suffix collision: xtmi-sent-ts is NOT the tag
        "xtmi-sent-ts=1690000000123;badges=",
    ]
    prefixes = [
        ":some_user!some_user@some_user.tmi.twitch.tv",
        ":CamelCase1!camelcase1@camelcase1.tmi.twitch.tv",
        ":al-ice!al-ice@host",  # '-' not in the login charset -> drop
        ":tmi.twitch.tv",  # server prefix, no '!' -> drop
        ":!u@h",  # empty nick -> drop
    ]
    commands = ["PRIVMSG #ChannelA", "PRIVMSG #chan", "USERNOTICE #chan",
                "PRIVMSG nochan", "privmsg #chan", "PRIVMSG #"]
    bodies = [
        "Hello  world  Kappa",
        "\x01ACTION waves\x01",  # /me framing: Java trim strips \x01
        "   ",  # whitespace-only -> drop
        "\t\x0b\x0c ",  # tabs/controls-only: Java trim drops; space-only
        # trim would have kept it (ADVICE r10)
        ";tmi-sent-ts=1 forged in body",
        " :fake!fake@fake.tmi.twitch.tv PRIVMSG #evil :pwn",
        "PRIVMSG #evil :nested",
        "see http://x.test/#frag :)",
        "",
    ]
    lines = []
    # combinatorial core: every tagset x body over the canonical
    # prefix/command, plus every prefix/command over a canonical rest
    for ts in tagsets:
        for b in bodies:
            lines.append(f"@{ts} {prefixes[0]} {commands[0]} :{b}")
    for p in prefixes:
        for c in commands:
            lines.append(f"@{tagsets[0]} {p} {c} :hi there")
    # structural mutations: missing pieces, double spaces, no trailing
    lines += [
        f"@{tagsets[0]} {prefixes[0]} PRIVMSG #chan",
        f"@{tagsets[0]} {prefixes[0]} PRIVMSG #chan :",
        f"@{tagsets[0]}  {prefixes[0]} {commands[0]} :double space",
        f"@{tagsets[0]} {prefixes[0]}  {commands[0]} :double space 2",
        f"@{tagsets[0]}", "@", "@ :u!u@h PRIVMSG #c :x",
        f"{prefixes[0]} PRIVMSG #chan :no tags",
        "PING :tmi.twitch.tv", "not irc at all", "",
    ]
    # seeded random assembly from the pools (shapes the hand list missed)
    for _ in range(400):
        parts = []
        if rng.random() < 0.9:
            parts.append("@" + rng.choice(tagsets))
        if rng.random() < 0.9:
            parts.append(rng.choice(prefixes))
        if rng.random() < 0.95:
            parts.append(rng.choice(commands))
        if rng.random() < 0.9:
            parts.append(":" + rng.choice(bodies))
        lines.append(" ".join(parts))
    # text sources split on newlines — generated lines must stay lines
    return [ln for ln in lines if "\n" not in ln and "\r" not in ln]


def test_parser_matches_bot_model_on_adversarial_corpus(spark):
    """Property sweep: Spark parse == tokenizer-exact Bot model on
    ~500 adversarial TMI lines (forged body tags must NOT produce
    rows — ADVICE r10 anchoring)."""
    lines = _adversarial_corpus()
    want = sorted(
        filter(None, (_bot_model(ln) for ln in lines))
    )
    df = spark.createDataFrame([(x,) for x in lines], "value string")
    got = sorted(
        (r["timestamp"], r["channel"], r["username"], r["message"])
        for r in irc.parse_irc_lines(df).collect()
    )
    assert got == want
    # the forged-body line must be absent under its forged identity
    assert not any(u == "fake" or c == "evil" for _, c, u, _m in got)


def test_duckdb_twin_matches_spark_on_adversarial_corpus(spark):
    """The oracle's RE2 regexes + trim must reproduce the Spark parse
    bit-for-bit on the same hostile corpus (the round-trip oracle only
    sees encoder-shaped lines; this closes the gap)."""
    import duckdb

    lines = _adversarial_corpus()
    df = spark.createDataFrame([(x,) for x in lines], "value string")
    got_spark = sorted(
        (r["timestamp"], r["channel"], r["username"], r["message"])
        for r in irc.parse_irc_lines(df).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE wire AS SELECT * FROM (VALUES "
        + ",".join(["(?)"] * len(lines))
        + ") t(value)",
        lines,
    )
    got_duck = sorted(
        map(
            tuple,
            con.execute(
                f"""
    SELECT * FROM (
        SELECT CAST(NULLIF(regexp_extract(value, '{irc.TS_TAG_RE}', 1),
                           '') AS BIGINT) AS timestamp,
               lower(regexp_extract(value, '{irc.CHAN_RE}', 1)) AS channel,
               lower(regexp_extract(value, '{irc.USER_RE}', 1)) AS username,
               regexp_replace(regexp_extract(value, '{irc.MSG_RE}', 1),
                              '{irc._JTRIM_RE}', '', 'g') AS message
        FROM wire
    ) WHERE timestamp IS NOT NULL AND channel <> '' AND username <> ''
      AND message <> ''"""
            ).fetchall(),
        )
    )
    assert got_duck == got_spark


def test_forged_body_tag_on_tagless_line_drops(spark):
    """The exact ADVICE r10 scenario: a line MISSING the real
    tmi-sent-ts whose chat text contains ';tmi-sent-ts=123' must drop,
    not keep a body-derived sender-controlled event time."""
    lines = [
        "@badges= :u1!u1@u1.tmi.twitch.tv PRIVMSG #chan "
        ":look ;tmi-sent-ts=123 forged",
        ":u2!u2@u2.tmi.twitch.tv PRIVMSG #chan :@tmi-sent-ts=456 forged",
    ]
    assert _parse(spark, lines) == set()


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
