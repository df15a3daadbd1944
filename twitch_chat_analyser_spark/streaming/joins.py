"""Stream-stream interval join: click attribution over two live streams.

The reference has no stream-stream joins (SURVEY §2.D) — Spark
Structured Streaming provides them natively, and any event pipeline at
scale needs the pattern (join two unbounded streams on a key + a time
interval, with bounded state).

Semantics match :func:`operators.temporal.click_attribution` (design
D4, batch/stream duality — asserted in tests): for every purchase, all
clicks by the same user within the horizon before it.

State bounding (the part batch mode doesn't need): BOTH sides carry a
watermark and the join condition bounds event time in both directions,
so Spark can expire click state older than ``watermark + horizon`` and
purchase state older than ``watermark`` — state is O(events in the
horizon window), not O(stream history). Without the two-sided time
bound the join state would grow forever; this is the stream-stream
analog of SURVEY §7.6 item 4.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.temporal import ATTRIBUTION_HORIZON_MS

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("user_id", T.LongType(), False),
        T.StructField("event_type", T.StringType(), False),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)


def attribution_join(
    clicks: DataFrame,
    purchases: DataFrame,
    horizon_ms: int = ATTRIBUTION_HORIZON_MS,
) -> DataFrame:
    """The join itself, usable on batch or streaming inputs. ``clicks``
    needs (user_id, click_event_id, click_ts); ``purchases`` needs
    (purchase_event_id, user_id, purchase_ts). Aliases are applied
    HERE, so callers may pass any DataFrames with those columns — the
    join condition's qualified references previously only resolved for
    frames the internal ``_sides`` helper had pre-aliased (review
    r9)."""
    horizon_expr = f"INTERVAL {horizon_ms} MILLISECONDS"
    clicks = clicks.alias("clicks")
    purchases = purchases.alias("purchases")
    return (
        purchases.join(
            clicks,
            F.expr(
                "clicks.user_id = purchases.user_id"
                " AND clicks.click_ts <= purchases.purchase_ts"
                f" AND clicks.click_ts > purchases.purchase_ts - {horizon_expr}"
            ),
        )
        .select(
            "purchase_event_id",
            F.col("purchases.user_id").alias("user_id"),
            F.unix_millis("purchase_ts").alias("purchase_ms"),
            "click_event_id",
            F.unix_millis("click_ts").alias("click_ms"),
            (
                F.unix_millis("purchase_ts") - F.unix_millis("click_ts")
            ).alias("lag_ms"),
        )
    )


def _sides(events: DataFrame, watermark: str | None):
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_event_id"),
        F.col("ts").alias("click_ts"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_event_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    if watermark:
        clicks = clicks.withWatermark("click_ts", watermark)
        purchases = purchases.withWatermark("purchase_ts", watermark)
    return clicks.alias("clicks"), purchases.alias("purchases")


def start_click_attribution_stream(
    spark: SparkSession,
    events_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    horizon_ms: int = ATTRIBUTION_HORIZON_MS,
    watermark: str = "1 hour",
    trigger: dict | None = None,
):
    """Two filtered views of the same event stream, watermarked on both
    sides, interval-joined, appended to a parquet sink. Returns the
    StreamingQuery handle."""
    events = spark.readStream.schema(EVENT_SCHEMA).parquet(events_dir)
    clicks, purchases = _sides(events, watermark)
    joined = attribution_join(clicks, purchases, horizon_ms)
    return (
        joined.writeStream.outputMode("append")
        .format("parquet")
        .option("path", os.path.join(out_dir, "click_attribution"))
        .option(
            "checkpointLocation",
            os.path.join(checkpoint_dir, "click_attribution"),
        )
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )
