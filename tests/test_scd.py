"""SCD Type-2 semantics: changelog compression and incremental merge."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from twitch_chat_analyser_spark.operators import scd


def test_changelog_compression_runs_and_open_tail(spark):
    rows = [
        # user 1: A A B A -> three intervals (A, B, A), last open
        (1, dt.datetime(2024, 1, 1), 10, "A"),
        (1, dt.datetime(2024, 1, 2), 11, "A"),
        (1, dt.datetime(2024, 1, 3), 12, "B"),
        (1, dt.datetime(2024, 1, 4), 13, "A"),
        # user 2: single value -> one open interval
        (2, dt.datetime(2024, 1, 1), 14, "X"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string"
    )
    out = scd.scd2_from_changelog(
        df, "user_id", "event_type", tiebreak="event_id"
    ).orderBy("user_id", "valid_from_ms").collect()

    def ms(d):
        return int(
            dt.datetime(2024, 1, d, tzinfo=dt.timezone.utc).timestamp() * 1000
        )

    assert [
        (r.user_id, r.event_type, r.valid_from_ms, r.valid_to_ms) for r in out
    ] == [
        (1, "A", ms(1), ms(3)),
        (1, "B", ms(3), ms(4)),
        (1, "A", ms(4), None),
        (2, "X", ms(1), None),
    ]


def test_apply_closes_changed_and_appends_new(spark):
    hist = spark.createDataFrame(
        [
            ("kappa", "global", 100, 200),   # closed historical row
            ("kappa", "twitch", 200, None),  # current
            ("pog", "bttv", 150, None),      # current, unchanged
        ],
        "emote string, src string, valid_from_ms long, valid_to_ms long",
    )
    upd = spark.createDataFrame(
        [
            ("kappa", "7tv", 300),   # change -> close + new version
            ("pog", "bttv", 300),    # same value -> untouched
            ("lul", "ffz", 300),     # brand new key
        ],
        "emote string, src string, ts_ms long",
    )
    out = scd.scd2_apply(hist, upd, key="emote", attr="src").collect()
    got = {(r.emote, r.src, r.valid_from_ms, r.valid_to_ms) for r in out}
    assert got == {
        ("kappa", "global", 100, 200),
        ("kappa", "twitch", 200, 300),   # closed at update time
        ("kappa", "7tv", 300, None),     # new current version
        ("pog", "bttv", 150, None),      # unchanged current
        ("lul", "ffz", 300, None),       # first version of new key
    }


def test_apply_is_stable_under_reapplication(spark):
    """Re-applying the same update batch must be a no-op (idempotent
    merge — the foreachBatch replay-safety property)."""
    hist = spark.createDataFrame(
        [("kappa", "twitch", 200, None)],
        "emote string, src string, valid_from_ms long, valid_to_ms long",
    )
    upd = spark.createDataFrame(
        [("kappa", "7tv", 300)], "emote string, src string, ts_ms long"
    )
    once = scd.scd2_apply(hist, upd, key="emote", attr="src")
    twice = scd.scd2_apply(once, upd, key="emote", attr="src")
    assert {tuple(r) for r in once.collect()} == {
        tuple(r) for r in twice.collect()
    }


def test_apply_invariants_under_random_update_sequences(spark):
    """Round-10 property sweep (driver-side data, Spark only at the
    merge): replaying random per-key update sequences through
    scd2_apply must keep the SCD2 invariants at every step — exactly
    one OPEN row per live key, the open row carrying the latest value,
    closed rows immutable once written, and per-key interval
    boundaries chaining (each new version starts where the previous
    closed)."""
    import random

    rng = random.Random(5)
    hist_schema = (
        "k long, attr string, valid_from_ms long, valid_to_ms long"
    )
    history = spark.createDataFrame([], hist_schema)
    latest: dict[int, str] = {}
    closed_so_far: set[tuple] = set()
    t = 0
    for _step in range(6):
        t += 100
        batch = {
            k: rng.choice("ABC")
            for k in rng.sample(range(5), rng.randrange(1, 5))
        }
        updates = spark.createDataFrame(
            [(k, v, t) for k, v in batch.items()],
            "k long, attr string, ts_ms long",
        )
        history = scd.scd2_apply(history, updates, "k", "attr").cache()
        rows = history.collect()
        open_rows = {
            r["k"]: r for r in rows if r["valid_to_ms"] is None
        }
        for k, v in batch.items():
            latest[k] = v
        # exactly one open row per live key, holding the latest value
        assert set(open_rows) == set(latest)
        assert {k: r["attr"] for k, r in open_rows.items()} == latest
        # closed rows are append-only (never mutated or dropped)
        closed_now = {
            tuple(r) for r in rows if r["valid_to_ms"] is not None
        }
        assert closed_so_far <= closed_now
        closed_so_far = closed_now
        # per-key chain: sorted intervals abut (close == next open)
        by_key: dict[int, list] = {}
        for r in rows:
            by_key.setdefault(r["k"], []).append(r)
        for k, rs in by_key.items():
            rs.sort(key=lambda r: r["valid_from_ms"])
            for a, b in zip(rs, rs[1:]):
                assert a["valid_to_ms"] == b["valid_from_ms"]
            assert rs[-1]["valid_to_ms"] is None
