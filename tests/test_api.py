"""Read-path operator tests (SURVEY §2.B) on hand-built fact fixtures."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from twitch_chat_analyser_spark import dims
from twitch_chat_analyser_spark.plans import api

CS_SCHEMA = "channel string, timestamp long, messages long"
US_SCHEMA = "channel string, username string, timestamp long, messages long"
UES_SCHEMA = (
    "channel string, emote string, username string, timestamp long, occurrences long"
)

W = 900_000


def test_visible_only_semi_join(spark):
    cs = spark.createDataFrame(
        [("click", W, 5), ("error", W, 7), ("view", W, 1)], CS_SCHEMA
    )
    out = api.visible_only(cs, dims.channels_df(spark)).collect()
    assert sorted(r["channel"] for r in out) == ["click", "view"]


def test_top_chatters_excludes_bots_without_consuming_rank(spark):
    us = spark.createDataFrame(
        [
            ("c", "user_0", W, 100),  # bot: excluded (dims.EXCLUDED_USERS)
            ("c", "alice", W, 50),
            ("c", "bob", W, 30),
            ("c", "carol", W, 30),  # tie with bob -> username tiebreak
        ],
        US_SCHEMA,
    )
    out = api.top_chatters(us, "c", 0, 10 * W, 2).collect()
    assert [(r["username"], r["rank"]) for r in out] == [("alice", 1), ("bob", 2)]


def test_pre_window_total_excludes_sentinel_and_boundary(spark):
    cs = spark.createDataFrame(
        [("c", 0, 999), ("c", W, 5), ("c", 2 * W, 7), ("c", 3 * W, 11)], CS_SCHEMA
    )
    got = api.pre_window_total(cs, "c", 3 * W).collect()[0]["messages"]
    assert got == 12  # sentinel row (ts=0) and ts==start excluded


def test_cumulative_series_seeded_with_base(spark):
    cs = spark.createDataFrame(
        [("c", W, 10), ("c", 2 * W, 5), ("c", 3 * W, 2)], CS_SCHEMA
    )
    out = api.cumulative_series(cs, "c", 2 * W, 3 * W).collect()
    assert [(r["timestamp"], r["messages"]) for r in out] == [
        (2 * W, 15),
        (3 * W, 17),
    ]


def test_rolling_sums_anchored_at_max_timestamp(spark):
    now = 10_000 * W  # large enough that now-30d stays positive
    cs = spark.createDataFrame(
        [("c", now, 1), ("c", now - 3_000_000, 10), ("c", now - 100_000_000, 100)],
        CS_SCHEMA,
    )
    r = api.rolling_sums(cs, "c").collect()[0]
    assert r["last_5m"] == 1
    assert r["last_1h"] == 11
    assert r["last_30d"] == 111


def _chan_dim(spark, visible, hidden=()):
    rows = [(c, "1", False) for c in visible] + [
        (c, "1", True) for c in hidden
    ]
    return spark.createDataFrame(
        rows, "channel string, broadcaster_id string, hidden boolean"
    )


def test_user_emote_across_channels_null_fill_and_hidden_filter(spark):
    cs = spark.createDataFrame(
        [("a", W, 1), ("b", W, 1), ("h", W, 1)], CS_SCHEMA
    )
    ues = spark.createDataFrame(
        [("a", "spark", "u", 0, 9), ("h", "spark", "u", 0, 4)], UES_SCHEMA
    )
    chans = _chan_dim(spark, ["a", "b"], hidden=["h"])
    out = api.user_emote_across_channels(cs, ues, "spark", "u", chans).collect()
    got = {r["channel"]: r["occurrences"] for r in out}
    # the DISTINCT driver is hidden-filtered (ApiController.php:109):
    # channel 'h' must not appear even though the user used the emote
    assert got == {"a": 9, "b": 0}


def test_percentage_of_total(spark):
    ues = spark.createDataFrame(
        [("c", "spark", "u1", 0, 75), ("c", "spark", "u2", 0, 25)], UES_SCHEMA
    )
    out = api.percentage_of_total(ues, "c", "spark").collect()
    got = {r["username"]: (r["pct"], r["rank"]) for r in out}
    assert got == {"u1": (75.0, 1), "u2": (25.0, 2)}


def test_percentage_of_total_keeps_bots_in_denominator(spark):
    """MainController.php quirk (review r12): the grand total (:335-340)
    includes bots, the ranked rows (:348-351) exclude them — so the
    shown percentages sum to less than 100 when a bot used the emote,
    and ranks are consumed only by non-bots."""
    ues = spark.createDataFrame(
        [
            ("c", "spark", "bot", 0, 100),
            ("c", "spark", "u1", 0, 75),
            ("c", "spark", "u2", 0, 25),
        ],
        UES_SCHEMA,
    )
    out = api.percentage_of_total(ues, "c", "spark", bots=["bot"]).collect()
    got = {r["username"]: (r["pct"], r["rank"]) for r in out}
    # denominator is 200 (bot included); bot row itself absent
    assert got == {"u1": (37.5, 1), "u2": (12.5, 2)}


def test_last_seen_floors_to_seconds_and_filters_hidden(spark):
    us = spark.createDataFrame(
        [("c", "u", 1704067799999, 1), ("h", "u", 1704067799999, 1)],
        US_SCHEMA,
    )
    chans = _chan_dim(spark, ["c"], hidden=["h"])
    out = api.last_seen(us, "u", chans).collect()
    # hidden channel excluded (ApiController.php:87, review r12)
    assert [(r["channel"], r["last_seen"]) for r in out] == [
        ("c", 1704067799)
    ]


def test_users_leaderboard_shows_bots_with_empty_rank(spark):
    """MainController.php:438-455 quirk (review r12): bot rows stay in
    the list with an EMPTY rank; only non-bots consume ranks 1..N; the
    fetch is over-sized by |bots| so bots can't push users off."""
    us = spark.createDataFrame(
        [
            ("c", "bot", 0, 100),
            ("c", "alice", 0, 50),
            ("c", "bob", 0, 30),
            ("c", "carol", 0, 20),
        ],
        US_SCHEMA,
    )
    chans = _chan_dim(spark, ["c"])
    out = api.users_leaderboard(us, "c", chans, ["bot"], max_rank=2).collect()
    assert [(r["username"], r["is_bot"], r["rank"]) for r in out] == [
        ("bot", True, None),
        ("alice", False, 1),
        ("bob", False, 2),
    ]
