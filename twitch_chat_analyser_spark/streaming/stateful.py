"""Custom stateful streaming operator (SURVEY.md §7.6 item 6 surface):
per-key session tracking with explicit GroupState via
``applyInPandasWithState``.

The reference's only stateful operator is the generic keyed
window-accumulate-and-flush (AbstractStatsAggregation.java:63-115),
which Spark's built-in windowed aggregation covers (A5/A6). This module
exercises the surface Spark offers for operators the built-ins CANNOT
express: arbitrary per-key state machines. Sessionization-with-gap is
the canonical case — ``session_window`` exists for windowed aggs, but
emitting one row per CLOSED session, stitching sessions across
micro-batches, and expiring idle keys by timeout needs explicit state.

Semantics match the batch gaps-and-islands operator
(``operators.textops.sessionize``): a session closes when a later event
arrives more than ``gap_ms`` after the session's last event (emitted in
that batch), or when the key's processing-time timeout fires with an
open session (emitted then). Session ids are 1-based per key, in arrival
order — identical numbering to the batch operator.

Scale notes: state per key is four longs — millions of concurrent users
fit comfortably in the state store; the shuffle is the single groupBy on
user_id. Timeouts bound state for churned users; late events beyond a
closed session open a NEW session rather than mutating history, and an
event more than gap_ms OLDER than the open session's start forks into
its own singleton session (two such events within gap_ms of each other
fork separately where batch would merge them) — the streaming-vs-batch
divergences documented here; run batch backfills for exact
reconciliation, duality D4.

Idle-timeout flushing (``idle_timeout_ms``) is OFF by default: a query
with registered processing-time timers never terminates under
``availableNow`` (it stays up to service future timer fires), so bounded
replay/backfill runs must use ``NoTimeout`` and let each user's final
session stay open; a 24/7 service run turns the timeout on.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_OUTPUT_SCHEMA = (
    "user_id long, session_id long, n_events long, "
    "session_start_ms long, duration_ms long"
)
# (next_session_id, start_ms, last_ms, n_events) of the OPEN session
STATE_SCHEMA = "sid long, start long, last long, n long"

DEFAULT_GAP_MS = 30 * 60 * 1000


def _session_fn(gap_ms: int, idle_timeout_ms: int | None):
    import pandas as pd

    def fn(key, pdfs: Iterable["pd.DataFrame"], state: GroupState):
        (user_id,) = key
        closed: list[tuple] = []

        if state.hasTimedOut:
            if state.exists:
                sid, start, last, n = state.get
                closed.append((user_id, sid, n, start, last - start))
                state.remove()
            yield pd.DataFrame(
                closed,
                columns=[
                    "user_id",
                    "session_id",
                    "n_events",
                    "session_start_ms",
                    "duration_ms",
                ],
            )
            return

        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ms", "event_id"])

        if state.exists:
            sid, start, last, n = state.get
        else:
            sid, start, last, n = 0, None, None, 0

        for ms in rows["ms"]:
            ms = int(ms)
            if start is None:
                sid, start, last, n = sid + 1, ms, ms, 1
            elif ms - last > gap_ms:
                closed.append((user_id, sid, n, start, last - start))
                sid, start, last, n = sid + 1, ms, ms, 1
            elif start - ms > gap_ms:
                # a cross-batch event MORE than gap_ms older than the
                # open session's start cannot belong to it by the gap
                # rule (the batch dual puts it in its own earlier
                # session — ADVICE r9); emit it as a closed singleton
                # taking the LOWER id (batch numbers sessions in start
                # order) and renumber the not-yet-emitted open session.
                # Residual divergence: two such events within gap_ms of
                # EACH OTHER each fork separately where batch would
                # merge them — reconcile via batch backfill (D4).
                closed.append((user_id, sid, 1, ms, 0))
                sid += 1
            else:
                # min/max, not assignment: a CROSS-BATCH late event
                # (within gap_ms of the open session) sorts first
                # within its batch and would otherwise REWIND `last`,
                # spuriously closing the open session with a negative
                # duration (review r9); the batch dual
                # (textops.sessionize) takes min/max over the session
                start, last, n = min(start, ms), max(last, ms), n + 1

        state.update((sid, start, last, n))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            closed,
            columns=[
                "user_id",
                "session_id",
                "n_events",
                "session_start_ms",
                "duration_ms",
            ],
        )

    return fn


def session_window_counts(
    events: DataFrame, gap: str = "30 minutes", watermark: str | None = "0 seconds"
) -> DataFrame:
    """The BUILT-IN alternative (``F.session_window``): per-user session
    event counts with window bounds. Works identically on batch frames
    (watermark ignored) and streaming frames (append mode — a session
    emits once the watermark passes its close). Use this when windowed
    aggregates per session suffice; use :func:`sessionize_stream` when
    custom state/emission semantics are needed.

    -> user_id, session_start_ms, session_end_ms, n_events
    """
    src = events
    if watermark is not None and events.isStreaming:
        src = src.withWatermark("ts", watermark)
    return src.groupBy(
        F.session_window("ts", gap).alias("w"), "user_id"
    ).agg(F.count("*").alias("n_events")).select(
        "user_id",
        F.unix_millis("w.start").alias("session_start_ms"),
        F.unix_millis("w.end").alias("session_end_ms"),
        "n_events",
    )


def sessionize_stream_tws(
    events: DataFrame, gap_ms: int = DEFAULT_GAP_MS
) -> DataFrame:
    """The same closed-session operator on Spark 4's
    ``transformWithStateInPandas`` (StatefulProcessor API) — the
    successor to ``applyInPandasWithState`` with typed state variables
    (ValueState/ListState/MapState), per-state TTL, and schema
    evolution. Kept alongside the GroupState version so both custom-
    state surfaces are exercised; identical output contract to
    :func:`sessionize_stream`.

    Requires ``google.protobuf`` (the TWS state-server wire protocol)
    and the RocksDB state store provider; raises ImportError with a
    clear message where protobuf isn't installed (this container), and
    the pytest coverage skips accordingly — the operator is plumbing-
    complete, mirroring sessionize_stream's tested state machine.

    -> SESSION_OUTPUT_SCHEMA (closed sessions only, append mode)
    """
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "transformWithStateInPandas needs google.protobuf "
            "(pip install protobuf); use sessionize_stream instead"
        ) from e
    import pandas as pd
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
    from pyspark.sql.types import (
        LongType,
        StructField,
        StructType,
    )

    state_schema = StructType(
        [
            StructField("sid", LongType()),
            StructField("start", LongType()),
            StructField("last", LongType()),
            StructField("n", LongType()),
        ]
    )

    class SessionProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._open = handle.getValueState("open_session", state_schema)

        def handleInputRows(self, key, rows, timerValues):
            (user_id,) = key
            pdf = pd.concat(list(rows), ignore_index=True)
            pdf = pdf.sort_values(["ms", "event_id"])
            if self._open.exists():
                sid, start, last, n = self._open.get()
            else:
                sid, start, last, n = 0, None, None, 0
            closed = []
            for ms in pdf["ms"]:
                ms = int(ms)
                if start is None:
                    sid, start, last, n = sid + 1, ms, ms, 1
                elif ms - last > gap_ms:
                    closed.append((user_id, sid, n, start, last - start))
                    sid, start, last, n = sid + 1, ms, ms, 1
                elif start - ms > gap_ms:
                    # same very-late fork as _session_fn above
                    # (ADVICE r9): singleton session, lower id,
                    # open session renumbered
                    closed.append((user_id, sid, 1, ms, 0))
                    sid += 1
                else:
                    # same cross-batch late-event rewind guard as
                    # _session_fn above (review r9)
                    start, last, n = (
                        min(start, ms), max(last, ms), n + 1
                    )
            self._open.update((sid, start, last, n))
            yield pd.DataFrame(
                closed,
                columns=[
                    "user_id",
                    "session_id",
                    "n_events",
                    "session_start_ms",
                    "duration_ms",
                ],
            )

        def close(self) -> None:
            pass

    prepared = events.select(
        "user_id", "event_id", F.unix_millis("ts").alias("ms")
    )
    return prepared.groupBy("user_id").transformWithStateInPandas(
        SessionProcessor(),
        outputStructType=SESSION_OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="none",
    )


def sessionize_stream(
    events: DataFrame,
    gap_ms: int = DEFAULT_GAP_MS,
    idle_timeout_ms: int | None = None,
) -> DataFrame:
    """events(ts TIMESTAMP, user_id, event_id) streaming DataFrame ->
    append-mode stream of closed session rows (SESSION_OUTPUT_SCHEMA).

    ``idle_timeout_ms=None`` (default): no processing-time timers —
    required for bounded availableNow runs (see module docstring)."""
    prepared = events.select(
        "user_id", "event_id", F.unix_millis("ts").alias("ms")
    )
    timeout_conf = (
        GroupStateTimeout.NoTimeout
        if idle_timeout_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _session_fn(gap_ms, idle_timeout_ms),
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout_conf,
    )
