"""Twitch IRC (TMI) wire-format source — the hop UPSTREAM of Kafka.

The reference's bot receives chat as twitch4j ``ChannelMessageEvent``s
(Bot.java:110-137), which wrap Twitch IRC ``PRIVMSG`` lines::

    @badge-info=;...;tmi-sent-ts=1690000000000;... \
        :nick!nick@nick.tmi.twitch.tv PRIVMSG #channel :message text

This module reads that RAW wire format (a dumped IRC log is the replay
artifact one step before a dumped Kafka topic) and normalizes it to the
same canonical message relation every operator consumes — so a user can
backfill straight from chat logs without running the bot + Kafka at
all. Parsing is pure JVM ``regexp_extract`` (no Python in the plan) and
every regex is RE2-compatible, so the DuckDB oracle reproduces the
parse bit-for-bit.

Bot parity (Bot.java:113-129): rows with a missing user, missing
channel, or empty-after-trim message are DROPPED, message text gets
Java ``String.trim()`` semantics (strips every char <= U+0020, not just
spaces — so a tabs-only message drops exactly like the bot), and the
event time is the ``tmi-sent-ts`` tag (the TMI server send time
twitch4j surfaces as ``getFiredAtInstant``); lines without the tag (or
non-PRIVMSG traffic: PING, JOIN, USERNOTICE, ...) are dropped too.
Duplicated tags follow IRCv3's last-wins rule. Channel and login names are lowercased — IRC channel
names are case-insensitive and twitch4j's ``getName()`` returns the
lowercase login.

The encoder twin (:func:`encode_irc_lines`) renders the canonical
relation back onto the wire shape — the same serde-twin pattern as
``sources/kafka.py`` — and doubles as the test-vector generator for
the round-trip oracle (``irc_wire_roundtrip``): parse(encode(x)) must
equal x modulo the documented trim/drop normalization. CR/LF inside a
message are sanitized to spaces at encode time (IRC is line-framed; a
raw newline would split the message into an invalid line).

Scale notes: ``spark.read.text`` is a splittable line source; the
parse is a map-only projection (whole-stage codegen), so ingest
scales with input bytes exactly like the JSON replay path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# RE2-safe (no lookaround/backrefs) and identical in Java regex.
# Every regex is ANCHORED to the line grammar (`@tags :prefix PRIVMSG
# #chan :body`): IRCv3 tag values escape raw ';' and ' ' (as `\:` /
# `\s`), so within the leading tags token a literal ';' always
# separates tags and a raw space always ends the token — which means a
# message BODY can never satisfy these patterns (ADVICE r10: the old
# unanchored TS_TAG_RE let a body containing ';tmi-sent-ts=123' forge a
# sender-controlled event time on a line missing the real tag).
TS_TAG_RE = r"^@(?:[^ ]*;)?tmi-sent-ts=(\d+)[; ]"
USER_RE = r"^@[^ ]+ :([A-Za-z0-9_]+)!"
CHAN_RE = r"^@[^ ]+ :[^ ]+ PRIVMSG #([^ ]+) :"
MSG_RE = r"^@[^ ]+ :[^ ]+ PRIVMSG #[^ ]+ :(.*)"

# Java String.trim() strips every char <= U+0020 (Bot.java calls it on
# the message text), not just spaces — replicated explicitly on both
# the Spark and DuckDB sides (ADVICE r10: Spark/DuckDB trim() is
# space-only, so a tabs-only message survived that the bot drops).
_JTRIM_RE = r"^[\x00-\x20]+|[\x00-\x20]+$"


def parse_irc_lines(lines: DataFrame, col: str = "value") -> DataFrame:
    """``lines(<col> STRING)`` -> the canonical message relation
    (ts TIMESTAMP, timestamp BIGINT ms, channel, username, message),
    Bot-parity drops applied (module docstring).

    -> ts, timestamp, channel, username, message
    """
    v = F.col(col)
    # nullif before the cast: regexp_extract misses as '' and CAST(''
    # AS BIGINT) is an ERROR under ANSI mode — junk lines must drop,
    # not fail the job
    ts_ms = F.nullif(F.regexp_extract(v, TS_TAG_RE, 1), F.lit("")).cast(
        "long"
    )
    parsed = lines.select(
        ts_ms.alias("timestamp"),
        F.lower(F.regexp_extract(v, CHAN_RE, 1)).alias("channel"),
        F.lower(F.regexp_extract(v, USER_RE, 1)).alias("username"),
        F.regexp_replace(
            F.regexp_extract(v, MSG_RE, 1), _JTRIM_RE, ""
        ).alias("message"),
    )
    return parsed.filter(
        F.col("timestamp").isNotNull()  # regexp_extract miss -> '' -> null
        & (F.col("channel") != "")
        & (F.col("username") != "")
        & (F.col("message") != "")
    ).select(
        F.timestamp_millis("timestamp").alias("ts"),
        "timestamp",
        "channel",
        "username",
        "message",
    )


def encode_irc_lines(messages: DataFrame) -> DataFrame:
    """Canonical message relation -> one TMI wire line per row
    (``value`` STRING) — the encoder twin of :func:`parse_irc_lines`.
    CR/LF in the message body become spaces (IRC line framing).

    -> value
    """
    body = F.regexp_replace(F.col("message"), r"[\r\n]", " ")
    u = F.col("username")
    return messages.select(
        F.concat(
            F.lit("@tmi-sent-ts="),
            F.col("timestamp").cast("string"),
            F.lit(" :"),
            u,
            F.lit("!"),
            u,
            F.lit("@"),
            u,
            F.lit(".tmi.twitch.tv PRIVMSG #"),
            F.col("channel"),
            F.lit(" :"),
            body,
        ).alias("value")
    )


def read_messages_irc(
    spark: SparkSession, path: str, streaming: bool = False
) -> DataFrame:
    """IRC log file(s) -> canonical messages; batch or file-stream.
    Non-PRIVMSG lines (PING, JOIN, numerics, USERNOTICE) and malformed
    lines drop in the parse — decoder-parity with the JSON readers
    (sources/files.py)."""
    reader = spark.readStream if streaming else spark.read
    return parse_irc_lines(reader.text(path))


def irc_oracle_sql() -> str:
    """DuckDB dual of ``parse(encode(messages))``: the same concat and
    the same RE2 regexes, so the oracle exercises the PARSER, not just
    the expected output."""
    from ..registry import chat_ctes

    return f"""{chat_ctes()},
wire AS (
    SELECT '@tmi-sent-ts=' || CAST(timestamp AS VARCHAR) || ' :'
           || username || '!' || username || '@' || username
           || '.tmi.twitch.tv PRIVMSG #' || channel || ' :'
           || regexp_replace(message, '[\\r\\n]', ' ', 'g') AS value
    FROM messages
),
parsed AS (
    SELECT CAST(NULLIF(regexp_extract(value, '{TS_TAG_RE}', 1), '')
               AS BIGINT) AS timestamp,
           lower(regexp_extract(value, '{CHAN_RE}', 1)) AS channel,
           lower(regexp_extract(value, '{USER_RE}', 1)) AS username,
           regexp_replace(regexp_extract(value, '{MSG_RE}', 1),
                          '{_JTRIM_RE}', '', 'g') AS message
    FROM wire
)
SELECT timestamp, channel, username, message
FROM parsed
WHERE timestamp IS NOT NULL AND channel <> '' AND username <> ''
  AND message <> ''"""


def _q_irc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .. import ingest

    msgs = ingest.messages(spark, sf_dir)
    return parse_irc_lines(encode_irc_lines(msgs)).select(
        "timestamp", "channel", "username", "message"
    )


IRC_QUERIES = {"irc_wire_roundtrip": _q_irc_roundtrip}
