"""Dimension tables (SURVEY.md §1.3: ``emotes``, ``channels``, ``phrases``).

The reference maintains these in Postgres and reloads them into operator
memory on a TTL (EmoteExtractor.java:264-286, PhraseExtractor.java:146-153).
Here they are deterministic seed constants rendered BOTH ways from one
Python literal:

- :func:`emotes_df` etc. -> broadcast-joinable Spark DataFrames, and
- :func:`emotes_values_sql` etc. -> DuckDB ``VALUES`` CTE bodies,

so the engine under test and the DuckDB oracle share one source of truth.

The emote vocabulary intersects the synthetic ``documents`` corpus
vocabulary (TESTDATA.md); ``Kappa/PogChamp/DansGame`` are the reference's
seed rows (EmoteExtractor.java:276) and never match — exercising the
no-match path. Channel names are the ``events.event_type`` values, since
the events table plays the message stream (FIXTURES.md §4).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# EmoteType enum parity: reference emote/EmoteType.java:3-9.
EMOTE_TYPES = {
    "TWITCH_SUBSCRIBER": 0,
    "TWITCH_GLOBAL": 1,
    "BTTV": 2,
    "FFZ": 3,
    "EMOJI": 4,
    "SEVENTV": 5,
}

# (emote, type, channel)  channel NULL => global (EmoteExtractor.java:264-270)
EMOTES = [
    ("spark", 1, None),
    ("join", 1, None),
    ("merge", 2, None),
    ("vector", 3, None),
    ("window", 5, None),
    ("hash", 2, "click"),
    ("Kappa", 1, None),
    ("PogChamp", 1, None),
    ("DansGame", 1, None),
]

# (channel, broadcaster_id, hidden)  (EmoteExtractor.java:281-285)
# 'error' is the hidden channel driving the semi-join filter
# (MainController.php:739-742).
CHANNELS = [
    ("signup", "101", False),
    ("click", "102", False),
    ("purchase", "103", False),
    ("error", "104", True),
    ("view", None, False),
]

# (name, regex, channel_filter_regex, log_message)
# (PhraseExtractor.java:146-153); '[unclosed' exercises the invalid-regex
# skip path (PhraseExtractor.java:112-115). Regexes stay in the common
# Java-regex / RE2 subset so Spark (Java) and DuckDB (RE2) agree.
PHRASES = [
    ("spark_mentions", "spark", None, False),
    ("fast_pair", r"fast\s+\w+", None, True),
    ("click_merge", "merge", "cl.*", True),
    ("broken", "[unclosed", None, False),
]

# Bot usernames excluded from leaderboards (MainController.php:12).
EXCLUDED_USERS = ["user_0", "user_1"]


def valid_phrases() -> list[tuple]:
    """Drop rows whose regex does not compile — parity with the
    reference's load-time skip (PhraseExtractor.java:112-115)."""
    out = []
    for name, regex, cfr, log in PHRASES:
        try:
            re.compile(regex)
        except re.error:
            continue
        out.append((name, regex, cfr, log))
    return out


EMOTES_SCHEMA = T.StructType(
    [
        T.StructField("emote", T.StringType(), False),
        T.StructField("type", T.ShortType(), False),
        T.StructField("channel", T.StringType(), True),
    ]
)

CHANNELS_SCHEMA = T.StructType(
    [
        T.StructField("channel", T.StringType(), False),
        T.StructField("broadcaster_id", T.StringType(), True),
        T.StructField("hidden", T.BooleanType(), False),
    ]
)

PHRASES_SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType(), False),
        T.StructField("regex", T.StringType(), False),
        T.StructField("channel_filter_regex", T.StringType(), True),
        T.StructField("log_message", T.BooleanType(), False),
    ]
)


def _literal_df(spark: SparkSession, rows: list[tuple], schema: T.StructType) -> DataFrame:
    """Constant rows as a pure-expression plan (explode of an array of
    literal structs). Unlike ``spark.createDataFrame(list)`` — which
    plans a Scan ExistingRDD fed by applySchemaToPythonRDD — this stays
    entirely JVM-side: no Python evaluation at runtime, and the dim is
    trivially broadcastable in every micro-batch replan."""
    fields = schema.fields
    structs = [
        F.struct(
            *[
                F.lit(v).cast(f.dataType).alias(f.name)
                for f, v in zip(fields, row)
            ]
        )
        for row in rows
    ]
    return (
        spark.range(1)
        .select(F.explode(F.array(*structs)).alias("r"))
        .select("r.*")
    )


def emotes_df(spark: SparkSession) -> DataFrame:
    return _literal_df(spark, EMOTES, EMOTES_SCHEMA)


def channels_df(spark: SparkSession) -> DataFrame:
    return _literal_df(spark, CHANNELS, CHANNELS_SCHEMA)


def phrases_df(spark: SparkSession) -> DataFrame:
    return _literal_df(spark, valid_phrases(), PHRASES_SCHEMA)


def _sql_lit(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, float)):
        return str(v)
    return "'" + str(v).replace("'", "''") + "'"


def _values_sql(rows: list[tuple], cols: list[str]) -> str:
    body = ",\n    ".join("(" + ", ".join(_sql_lit(v) for v in r) + ")" for r in rows)
    return f"(VALUES\n    {body}\n) AS t({', '.join(cols)})"


def emotes_values_sql() -> str:
    return "SELECT * FROM " + _values_sql(EMOTES, ["emote", "type", "channel"])


def channels_values_sql() -> str:
    return "SELECT * FROM " + _values_sql(
        CHANNELS, ["channel", "broadcaster_id", "hidden"]
    )


def phrases_values_sql() -> str:
    return "SELECT * FROM " + _values_sql(
        valid_phrases(), ["name", "regex", "channel_filter_regex", "log_message"]
    )


def excluded_users_sql() -> str:
    return ", ".join(_sql_lit(u) for u in EXCLUDED_USERS)
