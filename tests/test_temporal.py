"""Golden tests for the temporal join operators (as-of join, range
join) on hand-built fixtures where every expected match is computed by
eye — same-ms ties, no-prior-click nulls, overlapping intervals."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from twitch_chat_analyser_spark.operators import temporal

# (event_id, user_id, event_type, ms)
EVENTS = [
    (1, 1, "click", 1_000),
    (2, 1, "purchase", 500),      # before any click -> null match
    (3, 1, "purchase", 1_000),    # same ms as click 1 -> >= matches it
    (4, 1, "click", 2_000),
    (5, 1, "click", 2_000),       # tie at same (user, ms): max id wins
    (6, 1, "purchase", 3_000),    # -> click 5
    (7, 2, "purchase", 9_000),    # other user: clicks of user 1 invisible
    (8, 2, "click", 8_000),
    (9, 2, "purchase", 8_500),    # -> click 8
    # range-join side: errors open [ms, ms+window)
    (10, 3, "error", 0),
    (11, 3, "error", 400),        # overlaps the window of event 10
    (12, 3, "error", 100_000),    # empty window
]

SCHEMA = "event_id long, user_id long, event_type string, ms long"


@pytest.fixture(scope="module")
def events_ms(spark):
    return spark.createDataFrame(EVENTS, SCHEMA)


def test_asof_matches_most_recent_prior_click(events_ms):
    out = {
        r["event_id"]: (r["click_event_id"], r["click_ms"], r["lag_ms"])
        for r in temporal.asof_last_click(events_ms).collect()
    }
    assert out[2] == (None, None, None)
    assert out[3] == (1, 1_000, 0)      # >= semantics: same-ms click counts
    assert out[6] == (5, 2_000, 1_000)  # tie at ms=2000 -> max event_id
    assert out[9] == (8, 8_000, 500)
    assert out[7] == (8, 8_000, 1_000)  # per-user: only user 2's click
    assert set(out) == {2, 3, 6, 7, 9}  # every purchase exactly once


def test_range_join_counts_overlapping_intervals(events_ms):
    # window 1000ms: purchases at user-agnostic ms 500, 1000, 3000, 8500, 9000
    out = {
        r["error_event_id"]: r["n_purchases"]
        for r in temporal.incident_purchase_counts(
            events_ms, window_ms=1_000
        ).collect()
    }
    # error@0 covers [0,1000) -> purchase@500 only (1000 excluded: half-open)
    assert out[10] == 1
    # error@400 covers [400,1400) -> purchases@500,@1000 (windows overlap,
    # the shared purchase@500 is counted in BOTH intervals)
    assert out[11] == 2
    assert out[12] == 0  # empty interval still emitted with zero count
    assert set(out) == {10, 11, 12}


def test_range_join_bucket_alignment_no_double_count(spark):
    # interval exactly bucket-aligned: start % window == 0; the spurious
    # second bucket must not double-count purchases in the same bucket
    rows = [
        (1, 1, "error", 1_000),
        (2, 1, "purchase", 1_000),
        (3, 1, "purchase", 1_999),
        (4, 1, "purchase", 2_000),  # outside [1000, 2000)
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    out = temporal.incident_purchase_counts(df, window_ms=1_000).collect()
    assert len(out) == 1 and out[0]["n_purchases"] == 2
