"""Streaming pipeline observability — in-plan metrics via
``Dataset.observe`` plus a listener that collects them per micro-batch.

The reference exposes per-record counters through Flink's metric
registry (task-level throughput/records metrics around
``EmoteAnalyser.java``'s operators); the Spark-native equivalent is
``observe()``: named aggregate expressions evaluated INSIDE the running
plan — no second source scan, no driver-side re-count — and reported on
every micro-batch through ``QueryProgressEvent.observedMetrics``. The
same observed frame works identically on batch frames (metrics arrive
via ``DataFrame.observe``'s batch listener path / collected plan).

Scale note: observed aggregates are map-side partials merged by the
existing exchange topology — attaching metrics adds zero shuffles to
the plan, which is the whole point of using ``observe`` over a separate
``count()`` job per trigger (the anti-pattern this module exists to
avoid).
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryListener

from ..sources.kafka import parse_wire, project_messages

INGEST_METRIC = "ingest"


def decode_with_metrics(
    kafka_df: DataFrame, name: str = INGEST_METRIC
) -> DataFrame:
    """A2 decode with in-plan ingest metrics: identical output relation
    to ``sources.kafka.decode_messages`` (same shared validity rule and
    projection), plus an ``observe`` node reporting per micro-batch:

    - ``records``   — wire records seen
    - ``malformed`` — records dropped by the validity rule
    - ``min_ts`` / ``max_ts`` — event-time bounds of the batch (epoch
      ms; watermark-lag monitoring without a second pass)
    """
    flagged = parse_wire(kafka_df)
    observed = flagged.observe(
        name,
        F.count(F.lit(1)).alias("records"),
        F.sum(F.when(~F.col("_ok"), 1).otherwise(0)).alias("malformed"),
        F.min(F.when(F.col("_ok"), F.col("m.timestamp"))).alias("min_ts"),
        F.max(F.when(F.col("_ok"), F.col("m.timestamp"))).alias("max_ts"),
    )
    return project_messages(observed.filter("_ok"))


class ObservedMetricsListener(StreamingQueryListener):
    """Collects ``observedMetrics`` rows per micro-batch (thread-safe;
    progress events arrive on the stream execution thread). Attach with
    ``spark.streams.addListener``; read ``batches`` after the query
    stops (or poll — see :meth:`wait_for`)."""

    def __init__(self, metric_name: str = INGEST_METRIC) -> None:
        self.metric_name = metric_name
        self.batches: list[dict] = []
        self.state_progress: list[dict] = []
        self._lock = threading.Lock()

    # StreamingQueryListener interface ---------------------------------
    def onQueryStarted(self, event) -> None:  # pragma: no cover
        pass

    def onQueryProgress(self, event) -> None:
        om = event.progress.observedMetrics
        if om and self.metric_name in om:
            row = om[self.metric_name]
            with self._lock:
                self.batches.append(row.asDict())
        # stateful-operator health: rows the watermark discarded and
        # state size, straight from Spark's progress (stateOperators) —
        # the lateness counter observe() cannot see (late rows never
        # reach the observe node after a watermarked aggregation)
        ops = getattr(event.progress, "stateOperators", None) or []
        dropped = sum(
            getattr(op, "numRowsDroppedByWatermark", 0) or 0 for op in ops
        )
        state_rows = sum(
            getattr(op, "numRowsTotal", 0) or 0 for op in ops
        )
        if ops:
            with self._lock:
                self.state_progress.append(
                    {
                        "dropped_by_watermark": dropped,
                        "state_rows": state_rows,
                    }
                )

    def onQueryTerminated(self, event) -> None:  # pragma: no cover
        pass

    def onQueryIdle(self, event) -> None:  # pragma: no cover
        pass

    # helpers ----------------------------------------------------------
    def totals(self) -> dict:
        """Sum of records/malformed across collected batches."""
        with self._lock:
            # observed sums over an EMPTY micro-batch arrive as NULL
            # (None) — guard both missing keys and null values
            return {
                "records": sum(
                    b.get("records") or 0 for b in self.batches
                ),
                "malformed": sum(
                    b.get("malformed") or 0 for b in self.batches
                ),
            }

    def wait_for(self, n_records: int, timeout_s: float = 30.0) -> bool:
        """Poll until >= ``n_records`` observed (progress events are
        asynchronous — a stopped query's last event may still be in
        flight)."""
        import time

        deadline = time.monotonic() + timeout_s
        while time.monotonic() < deadline:
            if self.totals()["records"] >= n_records:
                return True
            time.sleep(0.1)
        return False
