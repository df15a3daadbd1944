"""Temporal join operators: as-of join and interval/range join.

The reference has no such operators (SURVEY §2.D), but its data model
implies them: the ``streams`` uptime-span table (Bot.java:74-81,
SURVEY §1.1 "interval/range predicates on read") is exactly the
span side of a range join, and "attribute this message to the stream
that was live" is an as-of lookup. They are also staples of any
large-scale event pipeline, so both are built scale-first:

- **As-of join** — implemented with the union-merge pattern, NOT a
  range join: tag both sides, union, one window over
  ``(key, ts, side)``, ``last(..., ignoreNulls)`` carries the most
  recent left-side attribute forward. ONE shuffle on the equality key,
  zero row amplification, no inequality-join blowup — at 100 TB this
  is a single sort-shuffle, the same cost as the groupBy aggregations.
- **Range join** — bucketized: intervals of width W are exploded to
  the (at most two) W-sized time buckets they overlap; the point side
  computes its single bucket; the join is then a plain equi-join on
  bucket with the range predicate as a residual filter. Catalyst would
  otherwise plan a broadcast-nested-loop over the inequality — the
  bucket key turns it into a shuffled hash join that scales linearly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .. import ingest

INCIDENT_WINDOW_MS = 3_600_000  # 1 h incident window per error event


def _events_ms(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = ingest.load(spark, sf_dir, "events")
    return ev.select(
        "event_id", "user_id", "event_type", F.unix_millis("ts").alias("ms")
    )


def asof_last_click(events_ms: DataFrame) -> DataFrame:
    """For every ``purchase`` event: the most recent ``click`` by the
    same user at or before the purchase (DuckDB ``ASOF LEFT JOIN``
    semantics, ``>=`` on the timestamp), plus the lag between them.

    Clicks are first collapsed to one per (user, ms) — max event_id —
    so tie-breaking is deterministic in both engines.

    -> event_id, user_id, ms, click_event_id, click_ms, lag_ms
    """
    clicks = (
        events_ms.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ms")
        .agg(F.max("event_id").alias("click_event_id"))
    )
    purchases = events_ms.filter(F.col("event_type") == "purchase")
    tagged = clicks.select(
        "user_id",
        "ms",
        F.lit(0).alias("side"),
        "click_event_id",
        F.lit(None).cast("long").alias("event_id"),
    ).unionByName(
        purchases.select(
            "user_id",
            "ms",
            F.lit(1).alias("side"),
            F.lit(None).cast("long").alias("click_event_id"),
            "event_id",
        )
    )
    # side=0 sorts before side=1 at equal ms => a click at exactly the
    # purchase ms is visible to it (the >= of ASOF JOIN)
    w = Window.partitionBy("user_id").orderBy("ms", "side").rowsBetween(
        Window.unboundedPreceding, 0
    )
    carried = tagged.withColumn(
        "last_click_id", F.last("click_event_id", ignorenulls=True).over(w)
    ).withColumn(
        "last_click_ms",
        F.last(
            F.when(F.col("side") == 0, F.col("ms")), ignorenulls=True
        ).over(w),
    )
    return carried.filter(F.col("side") == 1).select(
        "event_id",
        "user_id",
        "ms",
        F.col("last_click_id").alias("click_event_id"),
        F.col("last_click_ms").alias("click_ms"),
        (F.col("ms") - F.col("last_click_ms")).alias("lag_ms"),
    )


def incident_purchase_counts(
    events_ms: DataFrame, window_ms: int = INCIDENT_WINDOW_MS
) -> DataFrame:
    """Range join: every ``error`` event opens an incident interval
    ``[ms, ms + window_ms)``; count the ``purchase`` events (any user)
    falling inside each interval. Intervals overlap freely.

    r13 rewrite (guide §2.2/§3.5: shuffle input bytes, not candidate
    pairs). The previous shape equi-joined exploded intervals with raw
    purchases on the shared bucket — correct, but the joined row count
    is SUM over buckets of (errors_b x purchases_b): with a 1 h window
    over a dense event stream that is quadratic-in-bucket-occupancy
    amplification (measured at sf0.1: ~151 M joined rows from 100 k
    events, 10.3 s isolated). Counting needs no pairs: with
    ``cum_b(t)`` = purchases in bucket ``b`` before ``t``, an interval
    ``[s, s + W)`` starting in bucket ``b0`` counts

        (total_{b0} - cum_{b0}(s)) + cum_{b0+1}(s + W)

    so each error contributes two boundary PROBES, unioned with the
    purchases and resolved by ONE running count per bucket partition
    (the union-merge technique the as-of join already uses). Probes
    sort before purchases at equal ms (strict ``<`` boundary), both
    cumulative and per-bucket totals come off the same window pass,
    and every error keeps its row (zero-purchase incidents need no
    join-back). Shuffled rows: P + 2E, independent of bucket
    occupancy; the per-bucket sort replaces the quadratic join.

    -> error_event_id, start_ms, n_purchases
    """
    errors = events_ms.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_event_id"),
        F.col("ms").alias("start_ms"),
    )
    purchases = events_ms.filter(F.col("event_type") == "purchase").select(
        F.col("ms").alias("p_ms")
    )
    b0 = F.expr(f"start_ms div {window_ms}")
    # two probes per error off ONE scan: (b0, s) reads the count BELOW
    # the window start in its own bucket; (b0+1, s+W) the count below
    # the window end in the next bucket
    probes = errors.select(
        "error_event_id",
        "start_ms",
        F.explode(
            F.array(
                F.struct(
                    b0.alias("bucket"),
                    F.col("start_ms").alias("t"),
                    F.lit(0).alias("hi"),
                ),
                F.struct(
                    (b0 + F.lit(1)).alias("bucket"),
                    (F.col("start_ms") + F.lit(window_ms)).alias("t"),
                    F.lit(1).alias("hi"),
                ),
            )
        ).alias("pr"),
    ).select(
        "error_event_id",
        "start_ms",
        F.col("pr.bucket").alias("bucket"),
        F.col("pr.t").alias("t"),
        F.col("pr.hi").alias("hi"),
        F.lit(0).alias("is_p"),
    )
    pts = purchases.select(
        F.expr(f"p_ms div {window_ms}").alias("bucket"),
        F.col("p_ms").alias("t"),
        F.lit(None).cast("long").alias("error_event_id"),
        F.lit(None).cast("long").alias("start_ms"),
        F.lit(None).cast("int").alias("hi"),
        F.lit(1).alias("is_p"),
    )
    # is_p orders probes BEFORE purchases at equal t: cum at a probe is
    # the count of purchases STRICTLY before t (>= s inclusive lower
    # bound / < s+W exclusive upper bound both reduce to strict-< reads)
    wcum = (
        Window.partitionBy("bucket")
        .orderBy("t", "is_p")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wtot = Window.partitionBy("bucket")
    merged = probes.unionByName(pts).select(
        "error_event_id",
        "start_ms",
        "hi",
        "is_p",
        F.sum("is_p").over(wcum).alias("cum"),
        F.sum("is_p").over(wtot).alias("tot"),
    )
    return (
        merged.filter(F.col("is_p") == 0)
        .groupBy("error_event_id", "start_ms")
        .agg(
            F.sum(
                F.when(F.col("hi") == 1, F.col("cum")).otherwise(
                    F.col("tot") - F.col("cum")
                )
            )
            .cast("long")
            .alias("n_purchases")
        )
    )


# --------------------------------------------------------------------------
# registry entries
# --------------------------------------------------------------------------


def _q_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    return asof_last_click(_events_ms(spark, sf_dir))


def _q_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    return incident_purchase_counts(_events_ms(spark, sf_dir))


ATTRIBUTION_HORIZON_MS = 1_800_000  # attribute clicks within 30 min


def click_attribution(
    events_ms: DataFrame, horizon_ms: int = ATTRIBUTION_HORIZON_MS
) -> DataFrame:
    """Every (purchase, click) pair where the same user clicked within
    ``horizon_ms`` before (or at) the purchase — the batch dual of the
    stream-stream interval join in ``streaming/joins.py`` (design D4:
    the same join condition runs over two streams with watermarks).

    Scale shape: the inequality rides as a residual predicate on a
    plain shuffled equi-join on ``user_id`` — no nested-loop; the time
    bound caps per-user amplification at (clicks in horizon).

    -> purchase_event_id, user_id, purchase_ms, click_event_id,
       click_ms, lag_ms
    """
    clicks = events_ms.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_event_id"),
        F.col("ms").alias("click_ms"),
    )
    purchases = events_ms.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_event_id"),
        "user_id",
        F.col("ms").alias("purchase_ms"),
    )
    return purchases.join(clicks, "user_id").filter(
        (F.col("click_ms") <= F.col("purchase_ms"))
        & (F.col("click_ms") > F.col("purchase_ms") - horizon_ms)
    ).select(
        "purchase_event_id",
        "user_id",
        "purchase_ms",
        "click_event_id",
        "click_ms",
        (F.col("purchase_ms") - F.col("click_ms")).alias("lag_ms"),
    )


def _q_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    return click_attribution(_events_ms(spark, sf_dir))


OHLC_BUCKET_MS = 3_600_000  # hourly candles


def ohlc_downsample(
    events: DataFrame, bucket_ms: int = OHLC_BUCKET_MS
) -> DataFrame:
    """OHLC candle downsampling of the event value stream per event
    type — the financial-style first/last/min/max rollup that a plain
    min/max/avg time-series rollup (rollups.py) can't express because
    open/close are ORDER-dependent. Determinism: open/close pick the
    value at the (ms, event_id) extremes via min_by/max_by on a single
    DECIMAL(38,0)-packed key ``ms * 10^19 + event_id`` — order-
    isomorphic to the lexicographic (ms, event_id) struct because both
    components are non-negative and event_id < 10^19 (BIGINT max is
    9.22e18) and the packed maximum ~8.6e31 fits DECIMAL(38,0) exactly;
    total order, engine-identical. high/low/count are order-free. No
    float arithmetic at all, so no summation-order concern.

    The packing is a performance contract, not cosmetics (r13, guide
    §7.2): a min_by/max_by whose ordering is a STRUCT has a
    non-mutable aggregation buffer, so Catalyst planned SortAggregate —
    a per-task sort of the whole event stream (x2, partial+final) that
    the docstring used to wrongly call hash-aggregation. The decimal
    buffer is UnsafeRow-mutable, so candles now genuinely build in ONE
    hash aggregation on (event_type, bucket), map-side partials and
    all; no window, no sort (pinned by test_ohlc_single_hash_agg).

    -> event_type, bucket_ms, open, high, low, close, n_events
    """
    ms = F.unix_millis("ts")
    bucket = (F.floor(ms / bucket_ms) * bucket_ms).cast("long")
    pack = (
        "CAST(unix_millis(ts) AS DECIMAL(38,0))"
        " * 10000000000000000000 + event_id"
    )
    return (
        events.groupBy(
            "event_type", bucket.alias("bucket_ms")
        )
        .agg(
            F.expr(f"min_by(value, {pack})").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.expr(f"max_by(value, {pack})").alias("close"),
            F.count("*").cast("long").alias("n_events"),
        )
        .orderBy("event_type", "bucket_ms")
    )


WINSOR_LO = 0.05
WINSOR_HI = 0.95


def winsorize_values(
    events: DataFrame, lo: float = WINSOR_LO, hi: float = WINSOR_HI
) -> DataFrame:
    """Per-event-type winsorization: clip ``value`` to that type's
    [p05, p95] — the standard robust-statistics pre-step before any
    mean-based aggregate on a heavy-tailed metric column. Percentiles
    are the EXACT order statistics at rank ``ceil(p * n)`` (the same
    explicit-rank rule the approx_percentile oracle pins), selected by
    one per-type window — never ``percentile_cont`` interpolation,
    whose float blend would differ across engines.

    Shape (100 TB): one window partitioned by event_type to rank
    values (per-type partitions; a skewed type is the usual range-
    partition-rank refinement), one 2-row-per-type bounds frame
    broadcast back. The clip itself is a map-only projection.

    -> event_id, event_type, value, value_winsorized
    """
    from pyspark.sql import Window

    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    ranked = events.select(
        "event_id", "event_type", "value",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy("event_type")).alias("n"),
    )
    bounds = (
        ranked.filter(
            (F.col("rn") == F.ceil(F.col("n") * F.lit(lo)))
            | (F.col("rn") == F.ceil(F.col("n") * F.lit(hi)))
        )
        .groupBy("event_type")
        .agg(
            F.min(
                F.when(
                    F.col("rn") == F.ceil(F.col("n") * F.lit(lo)),
                    F.col("value"),
                )
            ).alias("lo_v"),
            F.min(
                F.when(
                    F.col("rn") == F.ceil(F.col("n") * F.lit(hi)),
                    F.col("value"),
                )
            ).alias("hi_v"),
        )
    )
    return (
        events.join(F.broadcast(bounds), "event_type")
        .select(
            "event_id",
            "event_type",
            "value",
            F.least(F.greatest(F.col("value"), F.col("lo_v")), F.col("hi_v"))
            .alias("value_winsorized"),
        )
    )


def purchase_latency_percentiles(events_ms: DataFrame) -> DataFrame:
    """Time-to-convert distribution: for purchases with an attributed
    click (:func:`asof_last_click`), the p50/p90 click->purchase lag
    per hour-of-day of the purchase — the "when are users decisive"
    serving analytic that composes the as-of join with exact order
    statistics. Percentiles are the explicit rank-``ceil(p*n)`` values
    (the approx_percentile-oracle rule), ordered by (lag_ms, event_id)
    so ties are deterministic; every output is an exact BIGINT.

    Shape (100 TB): the as-of join's one user-keyed merge (see
    asof_last_click) followed by a 24-partition window — the hour
    dimension bounds the partition count, the per-hour sort is the
    standard distributed-rank refinement target if a single hour ever
    dominates.

    -> hour_of_day, n_purchases, p50_lag_ms, p90_lag_ms
    """
    from pyspark.sql import Window

    attributed = asof_last_click(events_ms).filter(
        F.col("click_event_id").isNotNull()
    )
    hour = (
        F.floor((F.col("ms") % 86_400_000) / 3_600_000).cast("int")
    ).alias("hour_of_day")
    base = attributed.select(hour, "event_id", "lag_ms")
    w = Window.partitionBy("hour_of_day").orderBy("lag_ms", "event_id")
    ranked = base.select(
        "hour_of_day",
        "lag_ms",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy("hour_of_day")).alias("n"),
    )
    return (
        ranked.groupBy("hour_of_day")
        .agg(
            F.max("n").cast("long").alias("n_purchases"),
            F.max(
                F.when(
                    F.col("rn") == F.ceil(F.col("n") * F.lit(0.5)),
                    F.col("lag_ms"),
                )
            ).cast("long").alias("p50_lag_ms"),
            F.max(
                F.when(
                    F.col("rn") == F.ceil(F.col("n") * F.lit(0.9)),
                    F.col("lag_ms"),
                )
            ).cast("long").alias("p90_lag_ms"),
        )
        .orderBy("hour_of_day")
    )


def _q_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ohlc_downsample(ingest.load(spark, sf_dir, "events"))


def _q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return winsorize_values(ingest.load(spark, sf_dir, "events"))


def _q_latency_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return purchase_latency_percentiles(_events_ms(spark, sf_dir))


TEMPORAL_QUERIES = {
    "asof_purchase_last_click": _q_asof,
    "range_incident_purchases": _q_range,
    "stream_join_click_attribution": _q_click_attribution,
    "events_ohlc_hourly": _q_ohlc,
    "events_winsorized_values": _q_winsorize,
    "purchase_latency_percentiles": _q_latency_pct,
}

_EV_CTE = (
    "SELECT event_id, user_id, event_type, epoch_ms(ts) AS ms FROM events"
)


def temporal_oracles() -> dict[str, str]:
    return {
        "asof_purchase_last_click": f"""
WITH ev AS ({_EV_CTE}),
clicks AS (
    SELECT user_id, ms, max(event_id) AS click_event_id
    FROM ev WHERE event_type = 'click' GROUP BY 1, 2
),
purchases AS (
    SELECT event_id, user_id, ms FROM ev WHERE event_type = 'purchase'
)
SELECT p.event_id, p.user_id, p.ms,
       c.click_event_id, c.ms AS click_ms, p.ms - c.ms AS lag_ms
FROM purchases p
ASOF LEFT JOIN clicks c ON p.user_id = c.user_id AND p.ms >= c.ms""",
        "range_incident_purchases": f"""
WITH ev AS ({_EV_CTE}),
errors AS (
    SELECT event_id AS error_event_id, ms AS start_ms
    FROM ev WHERE event_type = 'error'
),
purchases AS (SELECT ms AS p_ms FROM ev WHERE event_type = 'purchase')
SELECT e.error_event_id, e.start_ms,
       CAST(count(p.p_ms) AS BIGINT) AS n_purchases
FROM errors e
LEFT JOIN purchases p
  ON p.p_ms >= e.start_ms AND p.p_ms < e.start_ms + {INCIDENT_WINDOW_MS}
GROUP BY 1, 2""",
        "stream_join_click_attribution": f"""
WITH ev AS ({_EV_CTE}),
clicks AS (
    SELECT user_id, event_id AS click_event_id, ms AS click_ms
    FROM ev WHERE event_type = 'click'
),
purchases AS (
    SELECT event_id AS purchase_event_id, user_id, ms AS purchase_ms
    FROM ev WHERE event_type = 'purchase'
)
SELECT p.purchase_event_id, p.user_id, p.purchase_ms,
       c.click_event_id, c.click_ms,
       p.purchase_ms - c.click_ms AS lag_ms
FROM purchases p
JOIN clicks c
  ON c.user_id = p.user_id
 AND c.click_ms <= p.purchase_ms
 AND c.click_ms > p.purchase_ms - {ATTRIBUTION_HORIZON_MS}""",
        # order-dependent open/close via explicit first/last rank over
        # (ms, event_id); high/low/count order-free; no float sums
        "events_ohlc_hourly": f"""
WITH ev AS (
    SELECT event_id, event_type, value, epoch_ms(ts) AS ms,
           CAST(floor(epoch_ms(ts) / {OHLC_BUCKET_MS})
                * {OHLC_BUCKET_MS} AS BIGINT) AS bucket_ms
    FROM events
),
ranked AS (
    SELECT *,
           row_number() OVER (PARTITION BY event_type, bucket_ms
                              ORDER BY ms, event_id) AS rf,
           row_number() OVER (PARTITION BY event_type, bucket_ms
                              ORDER BY ms DESC, event_id DESC) AS rl
    FROM ev
)
SELECT event_type, bucket_ms,
       max(CASE WHEN rf = 1 THEN value END) AS open,
       max(value) AS high, min(value) AS low,
       max(CASE WHEN rl = 1 THEN value END) AS close,
       count(*) AS n_events
FROM ranked GROUP BY 1, 2""",
        # exact order statistics at rank ceil(p*n) — the same explicit
        # rank rule as the approx_percentile oracle; clip is map-only
        "events_winsorized_values": f"""
WITH ranked AS (
    SELECT event_id, event_type, value,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY value, event_id) AS rn,
           count(*) OVER (PARTITION BY event_type) AS n
    FROM events
),
bounds AS (
    SELECT event_type,
           min(CASE WHEN rn = CAST(ceil(n * {WINSOR_LO}) AS BIGINT)
                    THEN value END) AS lo_v,
           min(CASE WHEN rn = CAST(ceil(n * {WINSOR_HI}) AS BIGINT)
                    THEN value END) AS hi_v
    FROM ranked
    WHERE rn = CAST(ceil(n * {WINSOR_LO}) AS BIGINT)
       OR rn = CAST(ceil(n * {WINSOR_HI}) AS BIGINT)
    GROUP BY 1
)
SELECT e.event_id, e.event_type, e.value,
       least(greatest(e.value, b.lo_v), b.hi_v) AS value_winsorized
FROM events e JOIN bounds b USING (event_type)""",
        # the committed ASOF join + explicit rank-ceil(p*n) order
        # statistics per hour-of-day — all-integer outputs
        "purchase_latency_percentiles": f"""
WITH ev AS ({_EV_CTE}),
clicks AS (
    SELECT user_id, ms, max(event_id) AS click_event_id
    FROM ev WHERE event_type = 'click' GROUP BY 1, 2
),
purchases AS (
    SELECT event_id, user_id, ms FROM ev WHERE event_type = 'purchase'
),
attributed AS (
    SELECT p.event_id, p.ms, p.ms - c.ms AS lag_ms
    FROM purchases p
    ASOF JOIN clicks c ON p.user_id = c.user_id AND p.ms >= c.ms
),
ranked AS (
    SELECT CAST(floor((ms % 86400000) / 3600000) AS INT) AS hour_of_day,
           lag_ms,
           row_number() OVER (
               PARTITION BY CAST(floor((ms % 86400000) / 3600000) AS INT)
               ORDER BY lag_ms, event_id) AS rn,
           count(*) OVER (
               PARTITION BY CAST(floor((ms % 86400000) / 3600000) AS INT)
           ) AS n
    FROM attributed
)
SELECT hour_of_day,
       CAST(max(n) AS BIGINT) AS n_purchases,
       CAST(max(CASE WHEN rn = CAST(ceil(n * 0.5) AS BIGINT)
                     THEN lag_ms END) AS BIGINT) AS p50_lag_ms,
       CAST(max(CASE WHEN rn = CAST(ceil(n * 0.9) AS BIGINT)
                     THEN lag_ms END) AS BIGINT) AS p90_lag_ms
FROM ranked GROUP BY hour_of_day""",
    }
