"""Pipeline-level golden tests (SURVEY.md §5.2).

Small deterministic in-repo fixtures with hand-computed expectations:
window bucket math, emote tokenization (substrings must NOT match,
repeats count), phrase find-all counts, channel-filter full-match, and
the invalid-regex skip.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from twitch_chat_analyser_spark import dims
from twitch_chat_analyser_spark.operators import aggregations as agg

MSG_SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("channel", T.StringType(), False),
        T.StructField("username", T.StringType(), False),
        T.StructField("message", T.StringType(), False),
    ]
)

EPOCH = dt.datetime(2024, 1, 1, 0, 0, 0, tzinfo=dt.timezone.utc)


def _msgs(spark, rows):
    return spark.createDataFrame(
        [(EPOCH + dt.timedelta(milliseconds=ms), ch, u, m) for ms, ch, u, m in rows],
        MSG_SCHEMA,
    )


BASE_MS = 1704067200000  # 2024-01-01T00:00:00Z, a 15-min boundary
WIN = 900_000


def test_window_bucket_math(spark):
    """FIXTURES.md edge pairs: t, t+899999 share a bucket; t+900000 starts
    the next (AbstractStatsAggregation.java:70-71)."""
    rows = [
        (0, "c", "u", "x"),
        (899_999, "c", "u", "x"),
        (900_000, "c", "u", "x"),
    ]
    out = agg.channel_stats(_msgs(spark, rows)).collect()
    got = {r["timestamp"]: r["messages"] for r in out}
    assert got == {BASE_MS + WIN: 2, BASE_MS + 2 * WIN: 1}


def test_late_events_land_in_old_bucket(spark):
    """Unbounded lateness parity: an out-of-order event lands in its
    event-time bucket regardless of arrival order."""
    rows = [
        (2_000_000, "c", "u", "x"),
        (10, "c", "u", "late"),
    ]
    out = agg.channel_stats(_msgs(spark, rows)).collect()
    got = {r["timestamp"]: r["messages"] for r in out}
    assert got == {BASE_MS + WIN: 1, BASE_MS + 3 * WIN: 1}


def test_emote_tokenization(spark):
    """Whitespace tokenization only: substrings must not match; repeated
    emotes count per occurrence (EmoteExtractor.java:92-102)."""
    rows = [
        (0, "c", "u", "spark spark sparkly"),
        (1, "c", "u", "nojoin join  merge"),
        (2, "c", "v", "nothing here"),
    ]
    out = agg.emote_stats(_msgs(spark, rows), dims.emotes_df(spark)).collect()
    got = {r["emote"]: r["occurrences"] for r in out}
    assert got == {"spark": 2, "join": 1, "merge": 1}


def test_user_emote_stats_keys(spark):
    rows = [
        (0, "c", "u1", "spark"),
        (1, "c", "u2", "spark spark"),
    ]
    out = agg.user_emote_stats(_msgs(spark, rows), dims.emotes_df(spark)).collect()
    got = {(r["username"], r["emote"]): r["occurrences"] for r in out}
    assert got == {("u1", "spark"): 1, ("u2", "spark"): 2}


def test_phrase_find_all_and_case_insensitive(spark):
    """matches = find-all count, case-insensitive
    (PhraseExtractor.java:68-72, :111)."""
    rows = [(0, "c", "u", "Spark and spark and SPARK")]
    out = agg.phrase_stats(_msgs(spark, rows), dims.phrases_df(spark)).collect()
    got = {r["phrase_name"]: r["matches"] for r in out}
    assert got["spark_mentions"] == 3


def test_phrase_channel_filter_full_match(spark):
    """channel_filter_regex is a FULL match (PhraseExtractor.java:62-66):
    'cl.*' matches channel 'click' but not 'uncle'."""
    rows = [
        (0, "click", "u", "merge merge"),
        (1, "uncle", "u", "merge"),
    ]
    out = agg.phrase_stats(_msgs(spark, rows), dims.phrases_df(spark)).collect()
    got = {(r["channel"], r["phrase_name"]): r["matches"] for r in out}
    assert got[("click", "click_merge")] == 2
    assert ("uncle", "click_merge") not in got


def test_invalid_regex_skipped():
    """'[unclosed' must be dropped at load (PhraseExtractor.java:112-115)."""
    names = [p[0] for p in dims.valid_phrases()]
    assert "broken" not in names
    assert "spark_mentions" in names


def test_matched_message_log_once_per_phrase(spark):
    """log_message side output: one row per (message, phrase)
    (PhraseExtractor.java:82-86)."""
    rows = [(0, "click", "u", "fast merge and fast join")]
    out = agg.messages_matching_phrase(
        _msgs(spark, rows), dims.phrases_df(spark)
    ).collect()
    phrases = sorted(r["matched_phrase"] for r in out)
    # fast_pair matches twice but logs once; click_merge once; spark_mentions
    # has log_message=false
    assert phrases == ["click_merge", "fast_pair"]


def test_totals_view(spark):
    """timestamp=0 sentinel totals equal the sum over window rows
    (AbstractStatsAggregation.java:33 semantics as a derived view)."""
    rows = [(i * 1_000_000, "c", "u", "x") for i in range(5)]
    cs = agg.channel_stats(_msgs(spark, rows))
    t = agg.totals(cs, ["channel"], "messages").collect()
    assert len(t) == 1
    assert t[0]["timestamp"] == 0
    assert t[0]["messages"] == 5
