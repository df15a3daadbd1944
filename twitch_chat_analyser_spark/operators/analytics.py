"""Window-analytics and distribution operators over the chat fact
tables: window-over-window deltas and moving sums, ntile quartiles,
fixed-width histograms, and channel co-occurrence similarity.

These extend the dashboard read path (SURVEY §2.B) with the standard
analytic-function repertoire the reference's PHP post-processing never
needed but any SQL consumer of the same fact tables would expect
(`MainController.php` reimplements cumulative sums in PHP at
:682-690 — lag/lead/moving windows are the same family, done engine-side).

Scale notes (100 TB): every window function here partitions by a
dimension key (channel / username) and orders within the partition —
one shuffle, per-key sorts, no global ordering anywhere. The histogram
is a pure projection + aggregation (bucket key has fixed cardinality).
Co-occurrence self-joins on username after a distinct — the pair count
is bounded by (channels choose 2), tiny, while the heavy side stays
hash-partitioned on the join key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import ingest
from . import aggregations as agg

MOVING_WINDOWS = 4  # trailing 1 h of 15-min buckets
LENGTH_BUCKET = 25  # histogram bucket width in characters
QUARTILES = 4


def window_deltas(fact: DataFrame, dims: list[str], value_col: str) -> DataFrame:
    """Window-over-window analytics on a window-end fact table: the
    delta vs the previous bucket (lag) and the trailing
    ``MOVING_WINDOWS``-bucket moving sum, per dimension key.

    All-integer arithmetic — exact under any shuffle order.

    -> *dims, timestamp, <value_col>, delta, moving_sum
    """
    w = Window.partitionBy(*dims).orderBy("timestamp")
    moving = w.rowsBetween(-(MOVING_WINDOWS - 1), Window.currentRow)
    return fact.select(
        *dims,
        "timestamp",
        value_col,
        (F.col(value_col) - F.lag(value_col).over(w)).alias("delta"),
        F.sum(value_col).over(moving).alias("moving_sum"),
    )


def global_row_number(
    df: DataFrame, order: list, out: str = "rank", total_col: str | None = None
) -> DataFrame:
    """Distributed exact global ``row_number`` over ``order`` — the
    two-phase rank every total-ordering operator here shares: range-
    partition on the sort key (partition p's keys all precede p+1's),
    rank WITHIN each partition (WindowExec with a partition key —
    per-partition sorts only), then add each partition's prefix offset.
    Offsets are an exclusive running sum over the per-partition counts —
    a single ordered window over ~numPartitions rows (bounded by the
    shuffle-partition setting, NOT the data — the one place a
    partition-less WindowExec is scale-safe); with ``total_col`` the
    total row count rides along from the same tiny aggregate.

    The range-partitioned frame is materialized ONCE (lazy
    localCheckpoint — stored on first compute inside the consuming
    action, then shared by every branch/stage) before the counts/ranks
    branches: RangePartitioner SAMPLES its boundaries per evaluation, so
    both branches must observe one materialization — exchange reuse is
    an optimizer courtesy, not a guarantee, and ``spark_partition_id``
    is nondeterministic so a CacheManager entry would never be
    re-matched (it would only leak). Same iterative-hygiene pattern as
    graph.connected_components.

    -> *df.columns, <out> [, <total_col>]
    """
    # lazy checkpoints: materialize (with storage) inside the consuming
    # action — no separate job — and every later stage reads the SAME
    # stored partitions. The INPUT is checkpointed too because a range
    # exchange runs a boundary-SAMPLING pass over its child before the
    # shuffle: un-materialized, the whole upstream would execute twice.
    local = (
        df.localCheckpoint(eager=False)
        .repartitionByRange(*order)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    ranked = local.withColumn(
        "_lrn", F.row_number().over(Window.partitionBy("_pid").orderBy(*order))
    )
    counts = local.groupBy("_pid").agg(F.count("*").alias("_cnt"))
    prior = counts.select(
        "_pid",
        F.coalesce(
            F.sum("_cnt").over(
                Window.orderBy("_pid").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ).alias("_offset"),
    )
    # rank stays LONG: _lrn is a per-partition int, but the global rank
    # exceeds 2^31 exactly at the scales this operator exists for;
    # callers with an int contract (row_number parity) cast at the edge
    out_df = ranked.join(F.broadcast(prior), "_pid").withColumn(
        out, (F.col("_lrn") + F.col("_offset")).cast("long")
    )
    if total_col:
        total = counts.agg(F.sum("_cnt").alias(total_col))
        out_df = out_df.crossJoin(F.broadcast(total))
    return out_df.drop("_pid", "_lrn", "_offset")


def user_quartiles(user_totals: DataFrame, buckets: int = QUARTILES) -> DataFrame:
    """ntile bucketing of users into activity quartiles by total message
    count (leaderboard percentile bands) — DISTRIBUTED exact ntile via
    :func:`global_row_number`, no single-partition window over the user
    rows anywhere. The bucket index applies ntile's exact semantics —
    the first ``n % buckets`` buckets take ``floor(n/buckets) + 1``
    rows — in all-integer arithmetic, so the result is bit-identical to
    ``ntile()`` and the oracle stays plain SQL.

    Deterministic tie-break on username keeps the assignment stable.

    -> username, messages, quartile
    """
    key = [F.desc("messages"), F.asc("username")]
    ranked = global_row_number(user_totals, key, out="_rn", total_col="_n")
    rn = F.col("_rn").cast("long")
    base = F.floor(F.col("_n") / buckets)
    rem = F.col("_n") % buckets
    cut = rem * (base + 1)
    quartile = F.when(
        rn <= cut, F.floor((rn - 1) / (base + 1)) + 1
    ).otherwise(
        rem + F.floor((rn - cut - 1) / F.greatest(base, F.lit(1))) + 1
    )
    return ranked.select(
        "username",
        "messages",
        quartile.cast("int").alias("quartile"),
    )


def message_length_histogram(messages: DataFrame) -> DataFrame:
    """Fixed-width histogram of message lengths: bucket lower bound ->
    count. Projection + bounded-cardinality groupBy; fully map-side
    combinable.

    -> bucket_lo, n_messages
    """
    bucket = F.expr(
        f"CAST((length(message) div {LENGTH_BUCKET}) * {LENGTH_BUCKET} AS BIGINT)"
    )
    return (
        messages.groupBy(bucket.alias("bucket_lo"))
        .agg(F.count("*").alias("n_messages"))
    )


def channel_cooccurrence(messages: DataFrame) -> DataFrame:
    """Channel-pair audience overlap: Jaccard similarity of the chatter
    sets of every channel pair (who shares an audience with whom).

    Shape (r14 rewrite, guide §2.4): ONE aggregation collapses each
    user to their sorted distinct channel SET (collect_set partial-
    aggregates map-side, bounded by the tiny channel cardinality), the
    channel pairs are then generated ARRAY-LOCALLY per user (i < j over
    the sorted set — the a < b ordering and dedup the old distinct +
    self-equi-join produced), and the per-channel audience sizes come
    from exploding the same sets. The username self-join and its
    second data-sized exchange are gone; the pair rollup is
    (channels choose 2)-sized. NULL usernames count toward audience
    sizes (the old distinct kept them) but contribute no pairs (the
    old equi-join never matched NULL), preserved exactly.

    -> channel_a, channel_b, shared_users, users_a, users_b, jaccard
    """
    user_sets = messages.groupBy("username").agg(
        F.array_sort(F.collect_set("channel")).alias("chs")
    )
    per_channel = (
        user_sets.select(F.explode("chs").alias("channel"))
        .groupBy("channel")
        .agg(F.count("*").alias("n_users"))
    )
    shared = (
        user_sets.filter(F.col("username").isNotNull())
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(chs, (a, i) -> "
                    "transform(slice(chs, i + 2, size(chs)), "
                    "b -> struct(a AS channel_a, b AS channel_b))))"
                )
            ).alias("p")
        )
        .groupBy(
            F.col("p.channel_a").alias("channel_a"),
            F.col("p.channel_b").alias("channel_b"),
        )
        .agg(F.count("*").alias("shared_users"))
    )
    pa = per_channel.select(
        F.col("channel").alias("channel_a"), F.col("n_users").alias("users_a")
    )
    pb = per_channel.select(
        F.col("channel").alias("channel_b"), F.col("n_users").alias("users_b")
    )
    return (
        shared.join(F.broadcast(pa), "channel_a")
        .join(F.broadcast(pb), "channel_b")
        .select(
            "channel_a",
            "channel_b",
            "shared_users",
            "users_a",
            "users_b",
            (
                F.col("shared_users").cast("double")
                / (F.col("users_a") + F.col("users_b") - F.col("shared_users"))
            ).alias("jaccard"),
        )
    )


BURST_BASELINE = 8  # trailing 2 h of 15-min buckets
BURST_Z = 3.0
BURST_MIN_BASELINE = 4  # need this many trailing buckets for a stable z


def burst_detection(
    fact: DataFrame,
    dims: list[str],
    value_col: str,
    baseline: int = BURST_BASELINE,
    z_cut: float = BURST_Z,
) -> DataFrame:
    """Rate-spike detection on a window-end fact table: each bucket's
    z-score against the trailing ``baseline`` buckets (current bucket
    excluded), flagged when z > ``z_cut``.

    Float-parity design: the moving mean/variance are derived from
    moving SUM and SUM-OF-SQUARES — exact BIGINT window sums in both
    engines — so the only floating-point steps are the final divisions
    and sqrt, evaluated as the identical expression tree in the DuckDB
    oracle (engine-native stddev implementations differ numerically;
    integer sums cannot). Sample variance:
    (sum_sq - sum^2 / n) / (n - 1).

    One shuffle on the dimension key; per-key ordered frames.

    -> *dims, timestamp, <value_col>, n_base, z, is_burst
    """
    w = (
        Window.partitionBy(*dims)
        .orderBy("timestamp")
        .rowsBetween(-baseline, -1)
    )
    x = F.col(value_col).cast("double")
    n = F.count(value_col).over(w).alias("n_base")
    s = F.sum(value_col).over(w)
    sq = F.sum(F.col(value_col) * F.col(value_col)).over(w)
    base = fact.select(
        *dims,
        "timestamp",
        value_col,
        n,
        s.alias("_s"),
        sq.alias("_sq"),
    ).filter(F.col("n_base") >= BURST_MIN_BASELINE)
    nn = F.col("n_base").cast("double")
    mean = F.col("_s") / nn
    var = (F.col("_sq") - F.col("_s") * F.col("_s") / nn) / (nn - 1)
    # guard var = 0 (flat baseline) -> z NULL, not NaN/inf — IEEE
    # specials don't round-trip identically through both engines' hashes
    z = F.when(var > 0, (x - mean) / F.sqrt(var))
    return base.select(
        *dims,
        "timestamp",
        value_col,
        "n_base",
        z.alias("z"),
        (z > z_cut).alias("is_burst"),
    )


# --------------------------------------------------------------------------
# registry entries
# --------------------------------------------------------------------------


def _q_window_deltas(spark: SparkSession, sf_dir: str) -> DataFrame:
    cs = agg.channel_stats(ingest.messages(spark, sf_dir))
    return window_deltas(cs, ["channel"], "messages")


def _q_user_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    # sum of per-window counts == total count: fold the two-level
    # aggregation (window buckets, then users) into ONE groupBy over the
    # message stream — same result as the oracle's SUM over user_stats,
    # half the aggregation work
    totals = (
        ingest.messages(spark, sf_dir)
        .groupBy("username")
        .agg(F.count("*").alias("messages"))
    )
    return user_quartiles(totals)


def _q_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    return message_length_histogram(ingest.messages(spark, sf_dir))


def _q_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    return channel_cooccurrence(ingest.messages(spark, sf_dir))


def _q_burst(spark: SparkSession, sf_dir: str) -> DataFrame:
    cs = agg.channel_stats(ingest.messages(spark, sf_dir))
    return burst_detection(cs, ["channel"], "messages")


ANALYTICS_QUERIES = {
    "channel_window_deltas": _q_window_deltas,
    "user_activity_quartiles": _q_user_quartiles,
    "message_length_histogram": _q_length_histogram,
    "channel_cooccurrence_jaccard": _q_cooccurrence,
    "channel_burst_detection": _q_burst,
}


def analytics_oracles() -> dict[str, str]:
    from ..registry import chat_ctes

    c = chat_ctes()
    return {
        "channel_window_deltas": f"""{c}
SELECT channel, timestamp, messages,
       messages - lag(messages) OVER w AS delta,
       CAST(sum(messages) OVER (PARTITION BY channel ORDER BY timestamp
            ROWS BETWEEN {MOVING_WINDOWS - 1} PRECEDING AND CURRENT ROW)
            AS BIGINT) AS moving_sum
FROM channel_stats
WINDOW w AS (PARTITION BY channel ORDER BY timestamp)""",
        "user_activity_quartiles": f"""{c},
totals AS (
    SELECT username, CAST(sum(messages) AS BIGINT) AS messages
    FROM user_stats GROUP BY username
)
SELECT username, messages,
       CAST(ntile({QUARTILES}) OVER (ORDER BY messages DESC, username) AS INT)
           AS quartile
FROM totals""",
        "message_length_histogram": f"""{c}
SELECT (length(message) // {LENGTH_BUCKET}) * {LENGTH_BUCKET} AS bucket_lo,
       count(*) AS n_messages
FROM messages GROUP BY 1""",
        "channel_cooccurrence_jaccard": f"""{c},
cu AS (SELECT DISTINCT channel, username FROM messages),
per_channel AS (SELECT channel, count(*) AS n_users FROM cu GROUP BY channel),
shared AS (
    SELECT a.channel AS channel_a, b.channel AS channel_b,
           count(*) AS shared_users
    FROM cu a JOIN cu b ON a.username = b.username AND a.channel < b.channel
    GROUP BY 1, 2
)
SELECT channel_a, channel_b, shared_users,
       pa.n_users AS users_a, pb.n_users AS users_b,
       CAST(shared_users AS DOUBLE)
           / (pa.n_users + pb.n_users - shared_users) AS jaccard
FROM shared
JOIN per_channel pa ON pa.channel = channel_a
JOIN per_channel pb ON pb.channel = channel_b""",
        "channel_burst_detection": f"""{c},
framed AS (
    SELECT channel, timestamp, messages,
        count(messages) OVER w AS n_base,
        CAST(sum(messages) OVER w AS BIGINT) AS s,
        CAST(sum(messages * messages) OVER w AS BIGINT) AS sq
    FROM channel_stats
    WINDOW w AS (PARTITION BY channel ORDER BY timestamp
                 ROWS BETWEEN {BURST_BASELINE} PRECEDING AND 1 PRECEDING)
)
SELECT channel, timestamp, messages, n_base,
    CASE WHEN (sq - s * s / CAST(n_base AS DOUBLE))
              / (CAST(n_base AS DOUBLE) - 1) > 0
         THEN (CAST(messages AS DOUBLE) - s / CAST(n_base AS DOUBLE))
              / sqrt((sq - s * s / CAST(n_base AS DOUBLE))
                     / (CAST(n_base AS DOUBLE) - 1))
    END AS z,
    CASE WHEN (sq - s * s / CAST(n_base AS DOUBLE))
              / (CAST(n_base AS DOUBLE) - 1) > 0
         THEN (CAST(messages AS DOUBLE) - s / CAST(n_base AS DOUBLE))
              / sqrt((sq - s * s / CAST(n_base AS DOUBLE))
                     / (CAST(n_base AS DOUBLE) - 1)) > {BURST_Z}
    END AS is_burst
FROM framed WHERE n_base >= {BURST_MIN_BASELINE}""",
    }
