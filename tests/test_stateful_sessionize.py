"""Custom stateful operator: streaming sessionization via
applyInPandasWithState must match the batch gaps-and-islands operator
for every session it closes, including sessions spanning micro-batches."""

from __future__ import annotations

import datetime as dt
import os

import pytest

from twitch_chat_analyser_spark.operators import textops
from twitch_chat_analyser_spark.streaming import stateful

EPOCH = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
GAP = 30 * 60 * 1000

EVENTS_SCHEMA = "ts timestamp, user_id long, event_id long"

# (minute-offset, user, event_id): user 1 has two sessions (gap at 90min),
# the second session SPANS the two files; user 2 has one open session.
FILE_1 = [(0, 1, 10), (5, 1, 11), (90, 1, 12), (0, 2, 20)]
FILE_2 = [(95, 1, 13), (200, 1, 14), (3, 2, 21)]


def _mk(spark, rows):
    return spark.createDataFrame(
        [
            (EPOCH + dt.timedelta(minutes=m), u, e)
            for m, u, e in rows
        ],
        EVENTS_SCHEMA,
    )


def test_streaming_sessions_match_batch_closed_sessions(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _mk(spark, FILE_1).coalesce(1).write.mode("append").parquet(src)
    _mk(spark, FILE_2).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stateful.sessionize_stream(stream, gap_ms=GAP)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = {
        (r.user_id, r.session_id): (r.n_events, r.session_start_ms, r.duration_ms)
        for r in spark.read.parquet(out).collect()
    }

    # batch truth over all events; streaming emits every CLOSED session
    # (each user's final session stays open awaiting timeout)
    batch = textops.sessionize(
        _mk(spark, FILE_1 + FILE_2).withColumnRenamed("ts", "ts"), gap_ms=GAP
    )
    batch_rows = {
        (r.user_id, r.session_id): (r.n_events, r.session_start_ms, r.duration_ms)
        for r in batch.collect()
    }
    last_open = {
        u: max(sid for (uu, sid) in batch_rows if uu == u)
        for u in {u for (u, _) in batch_rows}
    }
    expected = {
        k: v for k, v in batch_rows.items() if k[1] != last_open[k[0]]
    }
    assert got == expected
    # the cross-file session (user 1: events at 90 & 95 min) closed as ONE
    # session with 2 events — state stitched across micro-batches
    assert got[(1, 2)][0] == 2


def test_tws_processor_matches_group_state_version(spark, tmp_path):
    # Spark 4 transformWithStateInPandas variant: identical closed-
    # session output to the applyInPandasWithState operator on the same
    # two-micro-batch stream (RocksDB state store provider required).
    # The TWS state-server protocol needs google.protobuf, absent in
    # this container -> operator raises ImportError and we skip.
    pytest.importorskip("google.protobuf")
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _mk(spark, FILE_1).coalesce(1).write.mode("append").parquet(src)
    _mk(spark, FILE_2).coalesce(1).write.mode("append").parquet(src)

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        stream = (
            spark.readStream.schema(EVENTS_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            stateful.sessionize_stream_tws(stream, gap_ms=GAP)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )

    got = {
        (r.user_id, r.session_id): (r.n_events, r.session_start_ms, r.duration_ms)
        for r in spark.read.parquet(out).collect()
    }
    assert got == {
        (1, 1): (2, 1704067200000, 5 * 60 * 1000),
        (1, 2): (2, 1704067200000 + 90 * 60 * 1000, 5 * 60 * 1000),
        (2, 1): (2, 1704067200000, 3 * 60 * 1000),
    }


def test_tws_gate_raises_clear_importerror_without_protobuf(spark):
    try:
        import google.protobuf  # noqa: F401

        pytest.skip("protobuf available — gate not exercised")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="protobuf"):
        stateful.sessionize_stream_tws(_mk(spark, FILE_1))


def test_cross_batch_late_event_does_not_rewind_open_session(
    spark, tmp_path
):
    """Review r9: a late event landing INSIDE an open session's gap
    used to rewind `last` to the smaller timestamp, spuriously closing
    the session with a NEGATIVE duration. It must extend the session's
    span (min start / max last) like the batch dual."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    # batch 1: user 3 at minute 20; batch 2: a LATE minute-0 event
    # (within the 30-min gap of the open session) plus minute 100 —
    # far enough past minute 20 to close session 1 and open session 2
    _mk(spark, [(20, 3, 30)]).coalesce(1).write.mode("append").parquet(src)
    _mk(spark, [(0, 3, 31), (100, 3, 32)]).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stateful.sessionize_stream(stream, gap_ms=GAP)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    rows = spark.read.parquet(out).collect()
    # exactly one CLOSED session: minutes 0-20 (the late event extended
    # its span), 2 events, non-negative 20-minute duration
    assert len(rows) == 1
    r = rows[0]
    assert r.n_events == 2
    assert r.session_start_ms == 0 * 60_000 + int(EPOCH.timestamp()) * 1000
    assert r.duration_ms == 20 * 60_000


def test_very_late_cross_batch_event_forks_own_session(spark, tmp_path):
    """ADVICE r9: a cross-batch event more than gap_ms OLDER than the
    open session's start cannot belong to it by the gap rule — it must
    fork into its own closed singleton session (the batch dual would
    put it in its own earlier session) instead of being absorbed via
    the min-start rewind. The fork takes the LOWER session id (batch
    numbers sessions in start order); the not-yet-emitted open session
    is renumbered."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    # batch 1: user 4 opens a session at minute 100; batch 2: a VERY
    # late minute-10 event (90 min before the open start, > 30-min
    # gap), an in-gap minute-105 event, and a minute-200 event that
    # closes the (renumbered) open session
    _mk(spark, [(100, 4, 40)]).coalesce(1).write.mode("append").parquet(src)
    _mk(spark, [(10, 4, 41), (105, 4, 42), (200, 4, 43)]).coalesce(
        1
    ).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stateful.sessionize_stream(stream, gap_ms=GAP)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    epoch_ms = int(EPOCH.timestamp()) * 1000
    got = {
        (r.user_id, r.session_id): (
            r.n_events,
            r.session_start_ms,
            r.duration_ms,
        )
        for r in spark.read.parquet(out).collect()
    }
    assert got == {
        # the fork: singleton at minute 10, LOWER id, zero duration
        (4, 1): (1, epoch_ms + 10 * 60_000, 0),
        # the original open session (renumbered to 2): minutes 100-105,
        # untouched by the very-late event, closed by the minute-200 gap
        (4, 2): (2, epoch_ms + 100 * 60_000, 5 * 60_000),
    }


# ---------------------------------------------------------------------------
# Property sweep of the pure state machine (_session_fn driven directly
# with a fake GroupState — no Spark, so hypothesis can afford hundreds
# of cases): for IN-ORDER streams split at arbitrary micro-batch
# boundaries, the closed sessions must equal the batch gaps-and-islands
# result minus each user's final (still-open) session, at every split.
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


class _FakeState:
    def __init__(self):
        self._v = None
        self.hasTimedOut = False

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)

    def remove(self):
        self._v = None

    def setTimeoutDuration(self, ms):  # pragma: no cover - not used
        pass


def _drive(batches, gap_ms):
    """Run _session_fn over one user's event-ms batches; return the
    closed-session rows [(sid, n, start, dur), ...]."""
    import pandas as pd

    fn = stateful._session_fn(gap_ms, None)
    state = _FakeState()
    out = []
    for ms_list in batches:
        pdf = pd.DataFrame(
            {"ms": ms_list, "event_id": list(range(len(ms_list)))}
        )
        for res in fn((7,), iter([pdf]), state):
            out.extend(
                (int(r.session_id), int(r.n_events),
                 int(r.session_start_ms), int(r.duration_ms))
                for r in res.itertuples()
            )
    return out


def _batch_truth(ms_sorted, gap_ms):
    """Python gaps-and-islands over the full sorted event list ->
    [(sid, n, start, dur), ...] including the final open session."""
    sessions = []
    for ms in ms_sorted:
        if sessions and ms - sessions[-1][2] <= gap_ms:
            sid, start, _last, n = sessions[-1]
            sessions[-1] = (sid, start, ms, n + 1)
        else:
            sessions.append((len(sessions) + 1, ms, ms, 1))
    return [(sid, n, start, last - start) for sid, start, last, n in sessions]


@settings(max_examples=200, deadline=None)
@given(
    ms=st.lists(
        st.integers(min_value=0, max_value=10_000), min_size=1, max_size=30
    ),
    split=st.data(),
    gap=st.sampled_from([10, 100, 1000]),
)
def test_in_order_stream_equals_batch_at_every_split(ms, split, gap):
    ordered = sorted(ms)
    cut = split.draw(st.integers(min_value=0, max_value=len(ordered)))
    batches = [b for b in (ordered[:cut], ordered[cut:]) if b]
    got = _drive(batches, gap)
    want = _batch_truth(ordered, gap)[:-1]  # last session stays open
    assert got == want


@settings(max_examples=200, deadline=None)
@given(
    ms=st.lists(
        st.integers(min_value=0, max_value=10_000), min_size=2, max_size=30
    ),
    perm=st.randoms(use_true_random=False),
    gap=st.sampled_from([10, 100, 1000]),
)
def test_arbitrary_batching_invariants(ms, perm, gap):
    """With ARBITRARY cross-batch lateness (documented stream!=batch
    divergences apply), the machine must still uphold its invariants:
    every emitted duration is >= 0, n_events >= 1, session ids are
    unique, total emitted events never exceed the input count, and the
    union of emitted events plus the open session's count equals the
    input count."""
    events = list(ms)
    perm.shuffle(events)
    cut = perm.randrange(len(events))
    batches = [b for b in (events[:cut], events[cut:]) if b]
    got = _drive(batches, gap)
    assert all(dur >= 0 and n >= 1 for _, n, _, dur in got)
    sids = [sid for sid, *_ in got]
    assert len(sids) == len(set(sids))
    assert sum(n for _, n, _, _ in got) <= len(events)
