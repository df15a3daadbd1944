"""Mergeable-sketch aggregates: HLL distinct counting and t-digest
quantiles — the re-aggregation path that makes 100 TB interactive.

The reference has no approximate aggregates (SURVEY §2.D); its
distinct-ish questions are all exact SQL over pre-aggregated facts. At
100 TB, exact COUNT(DISTINCT) over raw events is a full shuffle of the
key universe per question asked. Sketches fix the *re-aggregation*
problem: persist a tiny sketch per (dims, bucket) once, then answer any
coarser rollup (channel/month, all-channels/day, …) by merging sketches
— never re-touching raw data. That's the same continuous-aggregate idea
as operators/rollups.py, extended to non-additive measures
(distinct counts ARE NOT summable; their sketches are).

Built on Spark's Apache DataSketches HLL functions (hll_sketch_agg /
hll_union_agg / hll_sketch_estimate) — partial-mergeable, so Catalyst
plans them with map-side partials like any sum. Estimates are
sketch-implementation-specific, so these are rows-only queries for the
driver; pytest pins exactness at small cardinalities (HLL is exact far
beyond test-data cardinality) and invariance of the merge path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import ingest

DAY_MS = 86_400_000


def daily_chatter_sketches(messages: DataFrame) -> DataFrame:
    """The persisted base table: one HLL sketch of the distinct-chatter
    set per (channel, day). At scale this is the only pass over raw
    events; everything below consumes sketches.

    -> channel, day_ms, chatter_sketch (binary), daily_chatters (est)
    """
    return (
        messages.withColumn(
            "day_ms", F.expr(f"(timestamp div {DAY_MS}) * {DAY_MS}")
        )
        .groupBy("channel", "day_ms")
        .agg(F.hll_sketch_agg("username").alias("chatter_sketch"))
        .withColumn(
            "daily_chatters",
            F.hll_sketch_estimate("chatter_sketch").cast("long"),
        )
    )


def merge_chatters(sketches: DataFrame, dims: list[str]) -> DataFrame:
    """Re-aggregate persisted sketches to any coarser grouping: distinct
    chatters per ``dims`` WITHOUT re-reading events. Distinct counts
    don't sum — a chatter active on two days is one chatter — but their
    sketches union losslessly.

    -> *dims, distinct_chatters
    """
    return (
        sketches.groupBy(*dims)
        .agg(F.hll_union_agg("chatter_sketch").alias("s"))
        .select(
            *dims,
            F.hll_sketch_estimate("s").cast("long").alias("distinct_chatters"),
        )
    )


def channel_chatters_via_sketch_merge(messages: DataFrame) -> DataFrame:
    """Per-channel all-time distinct chatters computed the scale way:
    daily sketches -> union per channel. Equals exact COUNT(DISTINCT)
    at test cardinalities (HLL is exact in sparse mode).

    -> channel, distinct_chatters
    """
    return merge_chatters(daily_chatter_sketches(messages), ["channel"])


def order_value_digests(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile per group — the one-pass partial-mergeable
    quantile path promised in tpch.percentile_order_values' scale note.
    accuracy=10000 makes the GATE-scale (sf0.01, ~3k rows/group) result
    exact — the summary holds every value and returns the
    rank-ceil(p*n) order statistic. Beyond that the per-partition
    summary MERGES compound the error bound, so larger scales are the
    usual bounded-error estimate (verified: sf0.1 deviates by ~1e-4
    relative — the sketch behaving as designed).

    -> o_orderpriority, approx_median, approx_p90
    """
    orders = ingest.load(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.expr(
            "approx_percentile(o_totalprice, array(0.5D, 0.9D), 10000)"
        ).alias("q")
    ).select(
        "o_orderpriority",
        F.col("q")[0].alias("approx_median"),
        F.col("q")[1].alias("approx_p90"),
    )


# --------------------------------------------------------------------------
# registry entries. HLL estimates are sketch-library-specific (rows-only);
# the quantile summary at accuracy=10000 degenerates to EXACT order
# statistics at gate scale (every group holds < accuracy values), so it
# carries a plain-SQL oracle.
# --------------------------------------------------------------------------


def _q_sketch_chatters(spark: SparkSession, sf_dir: str) -> DataFrame:
    return channel_chatters_via_sketch_merge(ingest.messages(spark, sf_dir))


def _q_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return order_value_digests(spark, sf_dir)


SKETCH_QUERIES = {
    "sketch_distinct_chatters": _q_sketch_chatters,
    "approx_percentile_order_values": _q_approx_percentiles,
}


def sketch_oracles() -> dict[str, str]:
    """Spark's quantile summary with an uncompressed buffer returns the
    value at rank ``ceil(p * n)`` (verified empirically at sf0.001 and
    sf0.01 for every group x percentile) — reproduced with an explicit
    row_number rank selection. Valid while every group stays under the
    10000-value accuracy budget; at larger SFs the sketch approximates
    and the oracle no longer applies (the gate runs sf0.01)."""
    return {
        "approx_percentile_order_values": """
SELECT o_orderpriority,
       max(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT)
                THEN o_totalprice END) AS approx_median,
       max(CASE WHEN rn = CAST(ceil(0.9 * n) AS BIGINT)
                THEN o_totalprice END) AS approx_p90
FROM (
    SELECT o_orderpriority, o_totalprice,
           row_number() OVER (PARTITION BY o_orderpriority
                              ORDER BY o_totalprice) AS rn,
           count(*) OVER (PARTITION BY o_orderpriority) AS n
    FROM orders
) GROUP BY o_orderpriority""",
    }
