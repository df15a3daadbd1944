"""Slowly-changing-dimension (SCD Type 2) history tracking.

The reference's dimension tables (`emotes`, `channels`, `phrases`,
`streams` — SURVEY.md §1.1) are slowly changing and externally
refreshed, but it keeps only the CURRENT row (`INSERT ... ON CONFLICT DO
NOTHING`, EmoteExtractor.java:264-286): history is lost on every
refresh. These operators add the warehouse-standard Type-2 treatment —
validity-interval rows — two ways:

- :func:`scd2_from_changelog` — rebuild the full interval history from
  an append-only change log in one pass (two window functions over a
  single ``partitionBy(key)`` shuffle; gaps-and-islands compression,
  no self-join).
- :func:`scd2_apply` — incrementally merge a batch of updates into an
  existing history (close changed current rows, append new versions) —
  the `foreachBatch` companion for streaming dim maintenance.

Scale: both shuffle once on the dimension key; history tables are dim-
sized (small relative to facts), so even the window sort is cheap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import ingest


def scd2_from_changelog(
    changes: DataFrame,
    key: str,
    attr: str,
    ts: str = "ts",
    tiebreak: str | None = None,
) -> DataFrame:
    """Compress an append-only change log into SCD2 validity intervals:
    one row per (key, run of consecutive equal ``attr``), valid from the
    run's first timestamp until the next run starts (NULL = current).

    -> key, attr, valid_from_ms, valid_to_ms (nullable)
    """
    order = [F.col(ts)] + ([F.col(tiebreak)] if tiebreak else [])
    w = Window.partitionBy(key).orderBy(*order)
    change_points = changes.withColumn("_prev", F.lag(attr).over(w)).filter(
        F.col("_prev").isNull() | (F.col("_prev") != F.col(attr))
    )
    # lead over the change points only: the next change closes this run
    w2 = Window.partitionBy(key).orderBy(*order)
    return (
        change_points.withColumn("_next_ts", F.lead(ts).over(w2))
        .select(
            key,
            attr,
            F.unix_millis(ts).alias("valid_from_ms"),
            F.unix_millis("_next_ts").alias("valid_to_ms"),
        )
    )


def scd2_apply(
    history: DataFrame,
    updates: DataFrame,
    key: str,
    attr: str,
    ts_ms: str = "ts_ms",
) -> DataFrame:
    """Merge one batch of updates (one row per key: the latest observed
    value) into an SCD2 history: keys whose current value changed get
    their open row closed at the update time and a new open row
    appended; unchanged keys and already-closed rows pass through.

    ``history``: key, attr, valid_from_ms, valid_to_ms (NULL = open).
    ``updates``: key, attr, ts_ms.
    """
    cur = history.filter(F.col("valid_to_ms").isNull())
    closed = history.filter(F.col("valid_to_ms").isNotNull())
    upd = updates.select(
        F.col(key),
        F.col(attr).alias("_new_attr"),
        F.col(ts_ms).alias("_upd_ms"),
    )
    joined = cur.join(upd, key, "left")
    unchanged = joined.filter(
        F.col("_new_attr").isNull() | (F.col("_new_attr") == F.col(attr))
    ).select(*history.columns)
    to_close = joined.filter(
        F.col("_new_attr").isNotNull() & (F.col("_new_attr") != F.col(attr))
    )
    closed_now = to_close.select(
        key, attr, "valid_from_ms", F.col("_upd_ms").alias("valid_to_ms")
    )
    # new versions: changed keys + keys with no current row at all
    brand_new = upd.join(cur, key, "left_anti").select(
        key,
        F.col("_new_attr").alias(attr),
        F.col("_upd_ms").alias("valid_from_ms"),
        F.lit(None).cast("long").alias("valid_to_ms"),
    )
    changed_new = to_close.select(
        key,
        F.col("_new_attr").alias(attr),
        F.col("_upd_ms").alias("valid_from_ms"),
        F.lit(None).cast("long").alias("valid_to_ms"),
    )
    return (
        closed.unionAll(unchanged)
        .unionAll(closed_now)
        .unionAll(changed_new)
        .unionAll(brand_new)
    )


def cdc_snapshot(
    changelog: DataFrame,
    key: str,
    payload: list[str],
    ts: str = "ts",
    tiebreak: str | None = None,
    delete_col: str = "is_delete",
) -> DataFrame:
    """Materialize a CDC changelog (inserts/updates/deletes per key) into
    the current snapshot: last writer wins per key, and keys whose last
    operation is a delete vanish. One window pass partitioned on the key
    — the standard changelog-compaction shape (same plan as a MERGE
    replay but in a single shuffle, no per-batch loop).

    -> key, *payload (latest surviving values)
    """
    order = [F.col(ts).desc()] + (
        [F.col(tiebreak).desc()] if tiebreak else []
    )
    w = Window.partitionBy(key).orderBy(*order)
    return (
        changelog.withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1) & ~F.col(delete_col))
        .select(key, *payload)
    )


def _q_cdc_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC materialization demo over the events log: each user's latest
    event wins; users whose latest event is an 'error' are treated as
    deleted (the op-column analog).

    -> user_id, event_type, value
    """
    ev = ingest.load(spark, sf_dir, "events").withColumn(
        "is_delete", F.col("event_type") == "error"
    )
    return cdc_snapshot(
        ev,
        key="user_id",
        payload=["event_type", "value"],
        ts="ts",
        tiebreak="event_id",
    ).orderBy("user_id")


def _q_scd2_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 intervals of each user's event_type 'state' rebuilt from the
    events change log (tiebreak on event_id for deterministic order)."""
    ev = ingest.load(spark, sf_dir, "events")
    return scd2_from_changelog(
        ev, key="user_id", attr="event_type", ts="ts", tiebreak="event_id"
    ).orderBy("user_id", "valid_from_ms")


SCD_QUERIES = {
    "scd2_user_state_history": _q_scd2_user_state,
    "cdc_user_snapshot": _q_cdc_snapshot,
}


def scd_oracles() -> dict[str, str]:
    return {
        "scd2_user_state_history": """
WITH pts AS (
    SELECT user_id, event_type, ts, event_id,
           lag(event_type) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS prev
    FROM events
),
runs AS (
    SELECT user_id, event_type, ts,
           lead(ts) OVER (PARTITION BY user_id
                          ORDER BY ts, event_id) AS next_ts
    FROM pts WHERE prev IS NULL OR prev <> event_type
)
SELECT user_id, event_type,
       epoch_ms(ts) AS valid_from_ms,
       epoch_ms(next_ts) AS valid_to_ms
FROM runs""",
        "cdc_user_snapshot": """
WITH ranked AS (
    SELECT user_id, event_type, value,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM events
)
SELECT user_id, event_type, value
FROM ranked WHERE rn = 1 AND event_type <> 'error'""",
    }
