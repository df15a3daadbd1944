"""Read-path operators B1-B18 (SURVEY.md §2.B) — the dashboard/API query
semantics of the reference (MainController.php / ApiController.php),
each a pure DataFrame function over the fact tables the write path
maintains.

Where the reference runs SQL + PHP post-processing loops (cumulative
sums, resampling, ranking), this module folds everything into one
Catalyst plan — one job per page instead of the reference's N+1 PDO
round trips (SURVEY.md §3.3).

Every top-k/LIMIT query carries a deterministic tiebreaker (the key
columns) so results are stable across engines and partitionings.

Scale notes (100 TB): the fact tables these read are pre-aggregated
15-min buckets — orders of magnitude smaller than raw events; filters
on (channel, timestamp) prune partitions when the serving store is
partitioned by channel (streaming/pipeline.py writes it that way).
Leaderboards are TakeOrderedAndProject (per-partition top-k + driver
merge, no full sort); window functions partition by channel, so the
only unpartitioned sort is the final ≤1000-row presentation ORDER BY.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import dims, ingest
from ..functions.resample import interpolate_on_grid, resample_grid
from ..operators import aggregations as agg
from ..registry import WIN_END, chat_ctes

# Deterministic query parameters (testdata spans 2024-01-01..01-30 UTC).
CHANNEL = "click"
USERNAME = "user_7"
EMOTE = "spark"
START_MS = 1_704_672_000_000  # 2024-01-08T00:00:00Z
END_MS = 1_705_881_600_000  # 2024-01-22T00:00:00Z
TOP_LIMIT = 25
RESAMPLE_POINTS = 100


# ---------------------------------------------------------------------------
# Composable read-path operators (inputs: fact/dim DataFrames)
# ---------------------------------------------------------------------------


def visible_only(df: DataFrame, channels: DataFrame) -> DataFrame:
    """B8 hidden-channel semi-join filter (MainController.php:739-742):
    ``channel IN (SELECT channel FROM channels WHERE hidden IS false)``."""
    vis = channels.filter(~F.col("hidden")).select("channel")
    return df.join(F.broadcast(vis), "channel", "left_semi")


def exclude_bots(df: DataFrame, bots: list[str]) -> DataFrame:
    """B9 excluded-chatters anti filter (MainController.php:348-350)."""
    return df.filter(~F.col("username").isin(bots))


def index_totals(channel_totals: DataFrame, channels: DataFrame) -> DataFrame:
    """B1+B10: all-time per-channel totals for visible channels
    (MainController.php:41)."""
    return visible_only(
        channel_totals.select("channel", "messages").distinct(), channels
    )


def range_series(stats: DataFrame, channel: str, start: int, end: int) -> DataFrame:
    """B2 window series (MainController.php:61-63)."""
    return (
        stats.filter(
            (F.col("channel") == channel)
            & (F.col("timestamp") >= start)
            & (F.col("timestamp") <= end)
        )
        .select("timestamp", "messages")
        .orderBy("timestamp")
    )


def pre_window_total(stats: DataFrame, channel: str, start: int) -> DataFrame:
    """B3 cumulative base at window start (MainController.php:50-58)."""
    return stats.filter(
        (F.col("channel") == channel)
        & (F.col("timestamp") > 0)
        & (F.col("timestamp") < start)
    ).agg(F.coalesce(F.sum("messages"), F.lit(0)).cast("long").alias("messages"))


def top_chatters(
    user_stats: DataFrame, channel: str, start: int, end: int, limit: int
) -> DataFrame:
    """B4+B5+B9+B17: in-window chatter leaderboard with bot exclusion and
    rank (MainController.php:175-191, :438-455). Bots are skipped without
    consuming a rank — the anti filter runs BEFORE ranking.

    Scale shape: top-k FIRST (`orderBy().limit()` compiles to
    TakeOrderedAndProject — each partition keeps its local top `limit`,
    the driver merges heaps; no all-row single-partition shuffle), then
    row_number over the surviving <= `limit` rows. Identical result to
    rank-then-filter because the rank order IS the sort order, but the
    global-ordering pass touches `limit` rows instead of |users|."""
    topk = (
        exclude_bots(user_stats, dims.EXCLUDED_USERS)
        .filter(
            (F.col("channel") == channel)
            & (F.col("timestamp") >= start)
            & (F.col("timestamp") <= end)
        )
        .groupBy("username")
        .agg(F.sum("messages").alias("messages"))
        .orderBy(F.desc("messages"), F.asc("username"))
        .limit(limit)
    )
    return topk.withColumn(
        "rank",
        F.row_number().over(Window.orderBy(F.desc("messages"), F.asc("username"))),
    ).orderBy("rank")


def users_leaderboard(
    user_totals: DataFrame,
    channel: str,
    channels: DataFrame,
    bots: list[str],
    max_rank: int = 100,
) -> DataFrame:
    """B17 users leaderboard, quirk-faithful (MainController.php:433-461,
    review r12): the reference does NOT drop bots — it renders their
    rows with an EMPTY rank while only non-bots consume ranks 1..N, and
    it over-fetches ``max_rank + |EXCLUDED_CHATTERS|`` rows so the bot
    rows can't push real users off the page (:442). ``top_chatters``
    models the window leaderboard (:175-191 has no bots at all); this
    is the all-time one (``timestamp = 0`` sentinel totals).

    Deviation for determinism: the reference's ``ORDER BY messages
    DESC`` leaves ties database-ordered; a username ASC tiebreak is
    added on both engines (same policy as every other leaderboard
    here). Empty rank is NULL (the PHP renders '' into HTML; NULL is
    the typed equivalent).

    The rank is a running count of non-bot rows over the ALREADY
    top-k-limited slice (≤ max_rank + |bots| rows), so the
    partition-less window is driver-bounded at any scale.

    -> username, messages, is_bot, rank
    """
    order = [F.desc("messages"), F.asc("username")]
    topk = (
        visible_only(user_totals.filter(F.col("channel") == channel), channels)
        .select("username", "messages")
        .orderBy(*order)
        .limit(max_rank + len(bots))
    )
    w = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    is_bot = F.col("username").isin(bots)
    return (
        topk.withColumn("is_bot", is_bot)
        .withColumn(
            "rank",
            F.when(
                ~F.col("is_bot"),
                F.sum(F.when(is_bot, 0).otherwise(1)).over(w).cast("int"),
            ),
        )
        .orderBy(*order)
    )


def top_emotes_window(
    emote_stats: DataFrame, channel: str, start: int, end: int, limit: int
) -> DataFrame:
    """B4+B5: in-window emote leaderboard (MainController.php:194-208,
    ApiController.php:183 top-10)."""
    return (
        emote_stats.filter(
            (F.col("channel") == channel)
            & (F.col("timestamp") >= start)
            & (F.col("timestamp") <= end)
        )
        .groupBy("emote")
        .agg(F.sum("occurrences").alias("occurrences"))
        .orderBy(F.desc("occurrences"), F.asc("emote"))
        .limit(limit)
    )


def emote_leaderboard(
    emotes: DataFrame, emote_totals: DataFrame, channel: str
) -> DataFrame:
    """B6: dim LEFT JOIN totals, keep occurrences > 0
    (MainController.php:232-237, LIMIT 1000 at :348-351)."""
    totals = emote_totals.filter(F.col("channel") == channel).select(
        "emote", "occurrences"
    )
    return (
        emotes.select("emote", "type")
        .join(totals, "emote", "left")
        .filter(F.col("occurrences") > 0)
        .orderBy(F.desc("occurrences"), F.asc("emote"))
        .limit(1000)
    )


def user_emote_across_channels(
    channel_stats: DataFrame,
    user_emote_totals: DataFrame,
    emote: str,
    username: str,
    channels_dim: DataFrame,
) -> DataFrame:
    """B7: DISTINCT channel driver LEFT JOIN user-emote totals, NULL->0
    (ApiController.php:105-116). The driver is filtered by the
    hidden-channels condition (``WHERE ...('c.channel')`` at :109) —
    review r12 found the filter missing here."""
    channels = visible_only(
        channel_stats.select("channel").distinct(), channels_dim
    )
    stats = user_emote_totals.filter(
        (F.col("emote") == emote) & (F.col("username") == username)
    ).select("channel", "occurrences")
    return (
        channels.join(stats, "channel", "left")
        .na.fill({"occurrences": 0})
        .select("channel", "occurrences")
    )


def last_seen(
    user_stats: DataFrame, username: str, channels: DataFrame
) -> DataFrame:
    """B11 max-per-group + ms->s floor (ApiController.php:85-94). The
    reference ANDs the hidden-channels condition into this query
    (ApiController.php:87) — a hidden channel the user chatted in must
    not appear in the response (review r12: the filter was missing
    here while present in B1/B8; 'error' is hidden in the test dim and
    carries real traffic, so this changes results)."""
    return (
        visible_only(user_stats, channels)
        .filter((F.col("username") == username) & (F.col("timestamp") > 0))
        .groupBy("channel")
        .agg(F.max("timestamp").alias("last_seen_ms"))
        .select("channel", F.floor(F.col("last_seen_ms") / 1000).alias("last_seen"))
    )


def sum_of_per_group_max(user_emote_stats: DataFrame, username: str) -> DataFrame:
    """B12 nested aggregate: SUM over per-emote MAX occurrences for one
    user (MainController.php:496-499, :335-339)."""
    per_emote = (
        user_emote_stats.filter(
            (F.col("username") == username) & (F.col("timestamp") > 0)
        )
        .groupBy("emote")
        .agg(F.max("occurrences").alias("max_occurrences"))
    )
    return per_emote.agg(
        F.coalesce(F.sum("max_occurrences"), F.lit(0))
        .cast("long")
        .alias("total_occurrences")
    )


def rolling_sums(channel_stats: DataFrame, channel: str) -> DataFrame:
    """B13 rolling last-N sums for N in {5min, 1h, 24h, 7d, 30d}
    (ApiController.php:154-178) — one conditional-aggregation pass
    instead of the reference's five queries. 'now' is the channel's max
    window timestamp (deterministic over static testdata)."""
    deltas = {
        "last_5m": 5 * 60_000,
        "last_1h": 3_600_000,
        "last_24h": 86_400_000,
        "last_7d": 7 * 86_400_000,
        "last_30d": 30 * 86_400_000,
    }
    # base feeds the broadcast 'now' anchor AND the conditional-agg scan
    # — one lazy materialization of the (small) per-channel slice keeps
    # the upstream stats derivation from running twice
    base = channel_stats.filter(
        (F.col("channel") == channel) & (F.col("timestamp") > 0)
    ).localCheckpoint(eager=False)
    now = base.agg(F.max("timestamp").alias("now_ms"))
    aggs = [
        F.coalesce(
            F.sum(F.when(F.col("timestamp") > F.col("now_ms") - d, F.col("messages"))),
            F.lit(0),
        )
        .cast("long")
        .alias(name)
        for name, d in deltas.items()
    ]
    return base.crossJoin(F.broadcast(now)).agg(*aggs)


def cumulative_series(
    channel_stats: DataFrame, channel: str, start: int, end: int
) -> DataFrame:
    """B14 rates->cumulative sums seeded with the pre-window base
    (MainController.php:682-690 applied at :72-73): running sum over the
    ordered in-window series + B3 base, in one plan."""
    # the pre-window base and the in-window series are two filters of
    # the SAME channel's stats — materialize that slice once (lazy
    # localCheckpoint) so the upstream derivation runs once, not twice;
    # only this channel's rows are stored, bounded at any corpus scale
    cs = channel_stats.filter(F.col("channel") == channel).localCheckpoint(
        eager=False
    )
    base = pre_window_total(cs, channel, start).select(
        F.col("messages").alias("base")
    )
    series = range_series(cs, channel, start, end)
    w = Window.orderBy("timestamp").rowsBetween(Window.unboundedPreceding, 0)
    return (
        series.crossJoin(F.broadcast(base))
        .select(
            "timestamp",
            (F.sum("messages").over(w) + F.col("base")).alias("messages"),
        )
        .orderBy("timestamp")
    )


def channel_series_resampled(
    channel_stats: DataFrame, channel: str, start: int, end: int, num_points: int
) -> DataFrame:
    """The full dashboard chart chain (MainController.php:137-139):
    B2 range scan -> B14 cumulative -> B15 resample-interpolate."""
    cum = cumulative_series(channel_stats, channel, start, end)
    grid = resample_grid(start, end, num_points)
    return interpolate_on_grid(cum, grid, "messages")


def empty_series_default(
    series: DataFrame, start: int, end: int, value_col: str = "messages"
) -> DataFrame:
    """B16 empty-series default (MainController.php:697-706): an empty
    series becomes two synthetic zero points at the window bounds.

    Single-plan formulation (no driver-side isEmpty branch): the
    fallback rows are gated on a broadcast 1-row count of the series, so
    the check rides inside the job.
    """
    spark = series.sparkSession
    # series feeds the count gate AND the passthrough branch; the input
    # is often a whole derivation chain (range scan, resample) — store
    # it once so the gate can't trigger a second full evaluation
    series = series.localCheckpoint(eager=False)
    n = series.agg(F.count(F.lit(1)).alias("n"))
    fallback = (
        spark.createDataFrame(
            [(start, 0), (end, 0)], f"timestamp long, {value_col} long"
        )
        .crossJoin(F.broadcast(n))
        .filter(F.col("n") == 0)
        .select("timestamp", value_col)
    )
    return series.select("timestamp", value_col).unionAll(fallback)


def dynamic_sort(df: DataFrame, sort_by: str, descending: bool) -> DataFrame:
    """B19 request-parameter sort key (MainController.php:274-283) with
    a deterministic key tiebreaker."""
    key = F.desc(sort_by) if descending else F.asc(sort_by)
    return df.orderBy(key, F.asc("emote"))


def emotes_per_channel_json(
    emote_totals: DataFrame, channels: DataFrame
) -> DataFrame:
    """B20 nested JSON reshaping (ApiController.php:49-64): per-channel
    ``{"emote": occurrences, ...}`` objects. Entries sorted by emote so
    the rendered JSON is deterministic across partitionings. The source
    endpoint filters hidden channels (ApiController.php:31-32) —
    review r12 found the filter missing here."""
    return visible_only(emote_totals, channels).groupBy("channel").agg(
        F.to_json(
            F.map_from_entries(
                F.sort_array(
                    F.collect_list(F.struct(F.col("emote"), F.col("occurrences")))
                )
            )
        ).alias("emotes_json")
    )


def legacy_deviation(user_stats: DataFrame) -> DataFrame:
    """B22 legacy deviation (MainController.php:547-558, usage commented
    out at :266-270): despite the name, the reference computes
    ``sqrt(sum(x^2) / (n - 1))`` — deviation from zero with a sample
    denominator (``$val`` is overwritten and never used). Reproduced
    bit-for-bit, NULL for n <= 1. x = per-user total messages in the
    channel.

    -> channel, n_users, deviation
    """
    per_user = (
        user_stats.filter(F.col("timestamp") > 0)
        .groupBy("channel", "username")
        .agg(F.sum("messages").alias("x"))
    )
    per_channel = per_user.groupBy("channel").agg(
        F.count("*").alias("n_users"),
        F.sum(F.pow("x", 2)).alias("sum_sq"),
    )
    return per_channel.select(
        "channel",
        "n_users",
        F.when(
            F.col("n_users") > 1,
            F.sqrt(F.col("sum_sq") / (F.col("n_users") - 1)),
        ).alias("deviation"),
    )


def percentage_of_total(
    user_emote_totals: DataFrame,
    channel: str,
    emote: str,
    bots: list[str] | None = None,
) -> DataFrame:
    """B18: each user's share of an emote's total occurrences
    (MainController.php:335-360), rank-ordered (B17).

    QUIRK reproduced bit-for-bit (review r12): the reference's
    denominator query (:335-340) does NOT exclude bots while the
    leaderboard rows (:348-351) DO (``username NOT IN ...``), so a
    channel whose emote is spammed by a bot renders percentages that
    sum to less than 100 — the bot's occurrences count in every
    divisor but its row never appears. The ranked rows are therefore
    bot-anti-filtered AFTER the grand total is taken.

    The grand total is an aggregate broadcast back onto the rows (one
    number) rather than `sum() OVER ()` — the empty-frame window form
    funnels every row through a single-partition WindowExec; the
    aggregate form is a partial+final hash agg plus a broadcast join.
    The full ranking is a total order by contract (the reference pages
    ALL ranked rows, MainController.php:348-360), but it is computed
    DISTRIBUTED via analytics.global_row_number — range partition +
    per-partition rank + broadcast prefix offsets — so no partition-less
    WindowExec ever sees the user rows (plan-pinned in
    test_plan_shape.py)."""
    from ..operators.analytics import global_row_number

    # the filtered slice feeds TWO branches (the broadcast grand total
    # and the ranked rows) — materialize it once (lazy localCheckpoint,
    # stored inside the consuming action) so the upstream derivation
    # (often a full fact build) never evaluates twice; the slice itself
    # is one (channel, emote)'s per-user rows, bounded at any scale
    base = user_emote_totals.filter(
        (F.col("channel") == channel) & (F.col("emote") == emote)
    ).localCheckpoint(eager=False)
    total = base.agg(F.sum("occurrences").alias("_total"))
    if bots:
        # rows only — the denominator above already summed the bots in
        base = exclude_bots(base, bots)
    scored = base.crossJoin(F.broadcast(total)).select(
        "username",
        "occurrences",
        # raw double, no rounding: both engines evaluate the identical
        # IEEE expression, so values hash bit-for-bit
        (F.lit(100.0) * F.col("occurrences") / F.col("_total")).alias("pct"),
    )
    return (
        global_row_number(
            scored, [F.desc("occurrences"), F.asc("username")], out="rank"
        )
        # row_number() parity at the API edge (reference renders int
        # ranks); the helper itself keeps the rank long for scale
        .withColumn("rank", F.col("rank").cast("int"))
        .orderBy("rank")
    )


def index_page(
    channel_stats: DataFrame,
    user_stats: DataFrame,
    channels: DataFrame,
    bots: list[str],
    start_ms: int,
) -> DataFrame:
    """The whole index page as ONE plan: per visible channel — all-time
    total, in-window recent messages, and the top non-bot chatter. The
    reference renders this with a pair of PDO queries PER channel
    (N+1 pattern, MainController.php:48-77); here the three aggregates
    compute in parallel branches of a single Catalyst plan and meet in
    two broadcast-sized joins (per-channel rows only).

    -> channel, total_messages, recent_messages, top_chatter,
       top_chatter_messages
    """
    totals = channel_stats.groupBy("channel").agg(
        F.sum("messages").alias("total_messages")
    )
    recent = (
        channel_stats.filter(F.col("timestamp") >= start_ms)
        .groupBy("channel")
        .agg(F.sum("messages").alias("recent_messages"))
    )
    per_user = (
        exclude_bots(user_stats, bots)
        .groupBy("channel", "username")
        .agg(F.sum("messages").alias("m"))
    )
    w = Window.partitionBy("channel").orderBy(F.desc("m"), F.asc("username"))
    top = (
        per_user.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "channel",
            F.col("username").alias("top_chatter"),
            F.col("m").alias("top_chatter_messages"),
        )
    )
    return (
        visible_only(totals, channels)
        .join(recent, "channel", "left")
        .join(top, "channel", "left")
        .na.fill({"recent_messages": 0})
    )


# ---------------------------------------------------------------------------
# queries() entries + oracles (fixed deterministic parameters)
# ---------------------------------------------------------------------------


def _facts(spark: SparkSession, sf_dir: str):
    msgs = ingest.messages(spark, sf_dir)
    return msgs


def _q_index_totals(spark, sf_dir):
    msgs = _facts(spark, sf_dir)
    # r14 window-elision (agg.totals_from_rows): identical totals, no
    # discarded per-window rollup — applied at every totals-from-
    # scratch site in this file
    totals = agg.totals_from_rows(msgs, ["channel"], "messages")
    return index_totals(totals, dims.channels_df(spark))


def _q_range_series(spark, sf_dir):
    return range_series(
        agg.channel_stats(_facts(spark, sf_dir)), CHANNEL, START_MS, END_MS
    )


def _q_pre_window_total(spark, sf_dir):
    return pre_window_total(
        agg.channel_stats(_facts(spark, sf_dir)), CHANNEL, START_MS
    )


def _q_top_chatters(spark, sf_dir):
    return top_chatters(
        agg.user_stats(_facts(spark, sf_dir)), CHANNEL, START_MS, END_MS, TOP_LIMIT
    )


def _q_top_emotes(spark, sf_dir):
    return top_emotes_window(
        agg.emote_stats(_facts(spark, sf_dir), dims.emotes_df(spark)),
        CHANNEL,
        START_MS,
        END_MS,
        10,
    )


def _q_emote_leaderboard(spark, sf_dir):
    msgs = _facts(spark, sf_dir)
    emote_totals = agg.totals_from_rows(
        agg.emote_occurrences(msgs, dims.emotes_df(spark)),
        ["channel", "emote"],
        "occurrences",
    )
    return emote_leaderboard(dims.emotes_df(spark), emote_totals, CHANNEL)


def _q_user_emote_across_channels(spark, sf_dir):
    msgs = _facts(spark, sf_dir)
    ue_totals = agg.totals_from_rows(
        agg.emote_occurrences(msgs, dims.emotes_df(spark)),
        ["channel", "emote", "username"],
        "occurrences",
    )
    # the operator consumes its first argument only as a DISTINCT
    # channel driver; the distinct channels of raw messages are the
    # identical set (every message lands in some window), so skip the
    # full tumbling-window aggregation pass the old
    # agg.channel_stats(msgs) wiring paid just to throw away its
    # windows (r14; guide §2.3 — project before the exchange: the
    # distinct now shuffles one pruned column's partial distincts)
    return user_emote_across_channels(
        msgs.select("channel"), ue_totals, EMOTE, USERNAME,
        dims.channels_df(spark),
    )


def _q_last_seen(spark, sf_dir):
    return last_seen(
        agg.user_stats(_facts(spark, sf_dir)), USERNAME,
        dims.channels_df(spark),
    )


def _q_users_leaderboard(spark, sf_dir):
    msgs = _facts(spark, sf_dir)
    user_totals = agg.totals_from_rows(
        msgs, ["channel", "username"], "messages"
    )
    return users_leaderboard(
        user_totals, CHANNEL, dims.channels_df(spark), dims.EXCLUDED_USERS
    )


def _q_sum_of_per_group_max(spark, sf_dir):
    return sum_of_per_group_max(
        agg.user_emote_stats(_facts(spark, sf_dir), dims.emotes_df(spark)), USERNAME
    )


def _q_rolling_sums(spark, sf_dir):
    return rolling_sums(agg.channel_stats(_facts(spark, sf_dir)), CHANNEL)


def _q_cumulative_series(spark, sf_dir):
    return cumulative_series(
        agg.channel_stats(_facts(spark, sf_dir)), CHANNEL, START_MS, END_MS
    )


def _q_series_resampled(spark, sf_dir):
    return channel_series_resampled(
        agg.channel_stats(_facts(spark, sf_dir)),
        CHANNEL,
        START_MS,
        END_MS,
        RESAMPLE_POINTS,
    )


def _q_series_resampled_multi(spark, sf_dir):
    """EVERY channel's in-window series resampled in one partitioned
    plan — the scale path for B15 (one shuffle on channel instead of a
    query per series)."""
    from ..functions.resample import interpolate_on_grid_multi

    cs = (
        agg.channel_stats(_facts(spark, sf_dir))
        .filter(
            (F.col("timestamp") >= START_MS) & (F.col("timestamp") <= END_MS)
        )
        .select("channel", "timestamp", "messages")
    )
    grid = resample_grid(START_MS, END_MS, RESAMPLE_POINTS)
    return interpolate_on_grid_multi(cs, ["channel"], grid, "messages")


VIS_EMOTES = ["spark", "join", "merge"]


def _q_channel_page_series(spark, sf_dir):
    """The channel page's entire chart payload in ONE plan (SURVEY §3.3:
    the reference issues a pre-window-base + range-series query pair PER
    visualized emote plus the message series — 2(E+1) Postgres round
    trips; MainController.php:114-170). Here every series (the channel's
    message counts + each visualized emote) flows long-format through
    one cumulative window and one partitioned resample: a single job,
    shuffling on the series key.

    -> series, timestamp, value
    """
    from ..functions.resample import interpolate_on_grid_multi

    msgs = _facts(spark, sf_dir)
    cs = (
        agg.channel_stats(msgs)
        .filter(F.col("channel") == CHANNEL)
        .select(
            F.lit("messages").alias("series"),
            "timestamp",
            F.col("messages").cast("double").alias("v"),
        )
    )
    es = (
        agg.emote_stats(msgs, dims.emotes_df(spark))
        .filter(
            (F.col("channel") == CHANNEL) & F.col("emote").isin(VIS_EMOTES)
        )
        .select(
            F.col("emote").alias("series"),
            "timestamp",
            F.col("occurrences").cast("double").alias("v"),
        )
    )
    # allseries (one channel's message + emote windows — small) feeds
    # both the pre-window base agg and the in-window cumulative scan;
    # materialize once so channel_stats + emote_stats derive only once
    allseries = cs.unionByName(es).localCheckpoint(eager=False)
    base = (
        allseries.filter(
            (F.col("timestamp") > 0) & (F.col("timestamp") < START_MS)
        )
        .groupBy("series")
        .agg(F.sum("v").alias("b"))
    )
    inwin = allseries.filter(
        (F.col("timestamp") >= START_MS) & (F.col("timestamp") <= END_MS)
    )
    w = (
        Window.partitionBy("series")
        .orderBy("timestamp")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = (
        inwin.withColumn("c", F.sum("v").over(w))
        .join(base, "series", "left")
        .select(
            "series",
            "timestamp",
            (F.coalesce("b", F.lit(0.0)) + F.col("c")).alias("value"),
        )
    )
    grid = resample_grid(START_MS, END_MS, RESAMPLE_POINTS)
    return interpolate_on_grid_multi(cum, ["series"], grid, "value")


def _q_empty_series(spark, sf_dir):
    # a channel that never chats -> the synthetic two-point fallback
    series = range_series(
        agg.channel_stats(_facts(spark, sf_dir)), "__no_such_channel__", START_MS, END_MS
    )
    return empty_series_default(series, START_MS, END_MS)


def _q_dynamic_sort(spark, sf_dir):
    msgs = _facts(spark, sf_dir)
    emote_totals = agg.totals_from_rows(
        agg.emote_occurrences(msgs, dims.emotes_df(spark)),
        ["channel", "emote"],
        "occurrences",
    )
    board = emote_leaderboard(dims.emotes_df(spark), emote_totals, CHANNEL)
    return dynamic_sort(board, "type", descending=True)


def _q_emotes_per_channel_json(spark, sf_dir):
    msgs = _facts(spark, sf_dir)
    channels = dims.channels_df(spark)
    # r14 fold (guide §2.3, the _q_user_quartiles pattern): the sum of
    # per-tumbling-window counts IS the total count, so the per-window
    # emote_stats layer + totals rollup collapse into ONE groupBy over
    # the occurrence stream; the hidden-channel semi-join moves BELOW
    # the aggregation (a channel filter commutes with a channel-keyed
    # groupBy), so hidden channels never enter the shuffle. Identical
    # rows (timestamp is the totals sentinel 0 on every row either way).
    occ = visible_only(
        agg.emote_occurrences(msgs, dims.emotes_df(spark)), channels
    )
    emote_totals = occ.groupBy("channel", "emote").agg(
        F.count("*").alias("occurrences")
    ).select(
        "channel", "emote",
        F.lit(0).cast("long").alias("timestamp"), "occurrences",
    )
    return emotes_per_channel_json(emote_totals, channels)


def _q_legacy_deviation(spark, sf_dir):
    return legacy_deviation(agg.user_stats(_facts(spark, sf_dir)))


def _q_pct_of_total(spark, sf_dir):
    msgs = _facts(spark, sf_dir)
    ue_totals = agg.totals_from_rows(
        agg.emote_occurrences(msgs, dims.emotes_df(spark)),
        ["channel", "emote", "username"],
        "occurrences",
    )
    return percentage_of_total(
        ue_totals, CHANNEL, EMOTE, bots=dims.EXCLUDED_USERS
    )


def _q_index_page(spark, sf_dir):
    msgs = _facts(spark, sf_dir)
    # ONE corpus pass (r14): the page's three aggregates (all-time
    # totals, in-window recent, top chatter) all sit at or above the
    # user_stats grain — channel_stats is its exact integer rollup
    # (count by (channel, window) == sum of the per-username counts) —
    # so compute user_stats once and lazily checkpoint it (it is
    # aggregate-sized: |channel x user x window| rows, tiny next to
    # messages). The previous wiring scanned + window-aggregated the
    # messages relation THREE times: column pruning gives each branch a
    # differently-pruned subtree, so ReuseExchange never fired (r14
    # executed-plan audit: 6 parquet scans, 10 exchanges, 0 reused).
    # Guide §2.4/§8 — share the pass, move the big rows once.
    us = agg.user_stats(msgs).localCheckpoint(eager=False)
    cs = us.groupBy("channel", "timestamp").agg(
        F.sum("messages").alias("messages")
    )
    return index_page(
        cs,
        us,
        dims.channels_df(spark),
        dims.EXCLUDED_USERS,
        START_MS,
    )


READ_PATH_QUERIES = {
    "index_page_single_plan": _q_index_page,
    "b1_index_totals": _q_index_totals,
    "b2_range_series": _q_range_series,
    "b3_pre_window_total": _q_pre_window_total,
    "b4_top_chatters": _q_top_chatters,
    "b5_top_emotes_window": _q_top_emotes,
    "b6_emote_leaderboard": _q_emote_leaderboard,
    "b7_user_emote_across_channels": _q_user_emote_across_channels,
    "b11_last_seen": _q_last_seen,
    "b17_users_leaderboard": _q_users_leaderboard,
    "b12_sum_of_per_group_max": _q_sum_of_per_group_max,
    "b13_rolling_sums": _q_rolling_sums,
    "b14_cumulative_series": _q_cumulative_series,
    "b15_series_resampled": _q_series_resampled,
    "b15_series_resampled_multi": _q_series_resampled_multi,
    "channel_page_single_plan": _q_channel_page_series,
    "b16_empty_series_default": _q_empty_series,
    "b18_pct_of_total": _q_pct_of_total,
    "b19_dynamic_sort": _q_dynamic_sort,
    "b20_emotes_per_channel_json": _q_emotes_per_channel_json,
    "b22_legacy_deviation": _q_legacy_deviation,
}


def read_path_oracles() -> dict[str, str]:
    c = chat_ctes()
    bots = dims.excluded_users_sql()
    grid = resample_grid(START_MS, END_MS, RESAMPLE_POINTS)
    grid_values = ", ".join(f"({t})" for t in grid)
    return {
        "index_page_single_plan": f"""{c},
totals AS (
    SELECT channel, CAST(sum(messages) AS BIGINT) AS total_messages
    FROM channel_stats GROUP BY channel
),
recent AS (
    SELECT channel, CAST(sum(messages) AS BIGINT) AS recent_messages
    FROM channel_stats WHERE timestamp >= {START_MS} GROUP BY channel
),
top_c AS (
    SELECT channel, username AS top_chatter, m AS top_chatter_messages FROM (
        SELECT channel, username, CAST(sum(messages) AS BIGINT) AS m,
               row_number() OVER (PARTITION BY channel
                   ORDER BY sum(messages) DESC, username ASC) AS rn
        FROM user_stats WHERE username NOT IN ({bots})
        GROUP BY channel, username
    ) WHERE rn = 1
)
SELECT t.channel, t.total_messages,
       coalesce(r.recent_messages, 0) AS recent_messages,
       tc.top_chatter, tc.top_chatter_messages
FROM totals t
LEFT JOIN recent r USING (channel)
LEFT JOIN top_c tc USING (channel)
WHERE t.channel IN (SELECT channel FROM channels_dim WHERE hidden IS false)""",
        "b1_index_totals": f"""{c}
SELECT DISTINCT s.channel, s.messages
FROM (SELECT channel, count(*) AS messages FROM messages GROUP BY channel) s
WHERE s.channel IN (SELECT channel FROM channels_dim WHERE hidden IS false)""",
        "b2_range_series": f"""{c}
SELECT timestamp, messages FROM channel_stats
WHERE channel = '{CHANNEL}' AND timestamp >= {START_MS} AND timestamp <= {END_MS}""",
        "b3_pre_window_total": f"""{c}
SELECT CAST(coalesce(sum(messages), 0) AS BIGINT) AS messages FROM channel_stats
WHERE channel = '{CHANNEL}' AND timestamp > 0 AND timestamp < {START_MS}""",
        "b4_top_chatters": f"""{c}
SELECT username, messages, rank FROM (
    SELECT username, CAST(sum(messages) AS BIGINT) AS messages,
           CAST(row_number() OVER (ORDER BY sum(messages) DESC, username ASC) AS INT) AS rank
    FROM user_stats
    WHERE channel = '{CHANNEL}' AND timestamp >= {START_MS} AND timestamp <= {END_MS}
      AND username NOT IN ({bots})
    GROUP BY username
) WHERE rank <= {TOP_LIMIT}""",
        "b5_top_emotes_window": f"""{c}
SELECT emote, CAST(sum(occurrences) AS BIGINT) AS occurrences
FROM emote_stats
WHERE channel = '{CHANNEL}' AND timestamp >= {START_MS} AND timestamp <= {END_MS}
GROUP BY emote ORDER BY occurrences DESC, emote ASC LIMIT 10""",
        "b6_emote_leaderboard": f"""{c}
SELECT e.emote, CAST(e.type AS SMALLINT) AS type, s.occurrences
FROM emotes e
LEFT JOIN (
    SELECT emote, count(*) AS occurrences FROM emote_occurrences
    WHERE channel = '{CHANNEL}' GROUP BY emote
) s ON s.emote = e.emote
WHERE s.occurrences > 0
ORDER BY s.occurrences DESC, e.emote ASC LIMIT 1000""",
        "b7_user_emote_across_channels": f"""{c}
SELECT c.channel, coalesce(s.occurrences, 0) AS occurrences
FROM (SELECT DISTINCT channel FROM channel_stats) c
LEFT JOIN (
    SELECT channel, count(*) AS occurrences FROM emote_occurrences
    WHERE emote = '{EMOTE}' AND username = '{USERNAME}' GROUP BY channel
) s ON s.channel = c.channel
WHERE c.channel IN (SELECT channel FROM channels_dim WHERE hidden IS false)""",
        "b11_last_seen": f"""{c}
SELECT channel, max(timestamp) // 1000 AS last_seen
FROM user_stats WHERE username = '{USERNAME}' AND timestamp > 0
  AND channel IN (SELECT channel FROM channels_dim WHERE hidden IS false)
GROUP BY channel""",
        "b17_users_leaderboard": f"""{c},
user_totals AS (
    SELECT username, CAST(sum(messages) AS BIGINT) AS messages
    FROM user_stats
    WHERE channel = '{CHANNEL}'
      AND channel IN (SELECT channel FROM channels_dim WHERE hidden IS false)
    GROUP BY username
),
topk AS (
    SELECT username, messages FROM user_totals
    ORDER BY messages DESC, username ASC
    LIMIT {100 + len(dims.EXCLUDED_USERS)}
)
SELECT username, messages,
       username IN ({bots}) AS is_bot,
       CASE WHEN username NOT IN ({bots}) THEN
           CAST(sum(CASE WHEN username IN ({bots}) THEN 0 ELSE 1 END)
                OVER (ORDER BY messages DESC, username ASC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS INT)
       END AS rank
FROM topk""",
        "b12_sum_of_per_group_max": f"""{c}
SELECT CAST(coalesce(sum(max_occurrences), 0) AS BIGINT) AS total_occurrences
FROM (
    SELECT emote, max(occurrences) AS max_occurrences FROM user_emote_stats
    WHERE username = '{USERNAME}' AND timestamp > 0 GROUP BY emote
)""",
        "b13_rolling_sums": f"""{c},
now_t AS (SELECT max(timestamp) AS now_ms FROM channel_stats
          WHERE channel = '{CHANNEL}' AND timestamp > 0)
SELECT
  CAST(coalesce(sum(CASE WHEN timestamp > now_ms - 300000 THEN messages END), 0) AS BIGINT) AS last_5m,
  CAST(coalesce(sum(CASE WHEN timestamp > now_ms - 3600000 THEN messages END), 0) AS BIGINT) AS last_1h,
  CAST(coalesce(sum(CASE WHEN timestamp > now_ms - 86400000 THEN messages END), 0) AS BIGINT) AS last_24h,
  CAST(coalesce(sum(CASE WHEN timestamp > now_ms - {7 * 86400000} THEN messages END), 0) AS BIGINT) AS last_7d,
  CAST(coalesce(sum(CASE WHEN timestamp > now_ms - {30 * 86400000} THEN messages END), 0) AS BIGINT) AS last_30d
FROM channel_stats, now_t
WHERE channel = '{CHANNEL}' AND timestamp > 0""",
        "b14_cumulative_series": f"""{c},
base AS (SELECT coalesce(sum(messages), 0) AS base FROM channel_stats
         WHERE channel = '{CHANNEL}' AND timestamp > 0 AND timestamp < {START_MS})
SELECT timestamp,
       CAST(sum(messages) OVER (ORDER BY timestamp
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) + base AS BIGINT) AS messages
FROM channel_stats, base
WHERE channel = '{CHANNEL}' AND timestamp >= {START_MS} AND timestamp <= {END_MS}""",
        "b15_series_resampled": f"""{c},
base AS (SELECT coalesce(sum(messages), 0) AS base FROM channel_stats
         WHERE channel = '{CHANNEL}' AND timestamp > 0 AND timestamp < {START_MS}),
series AS (
    SELECT timestamp,
           sum(messages) OVER (ORDER BY timestamp
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) + base AS v
    FROM channel_stats, base
    WHERE channel = '{CHANNEL}' AND timestamp >= {START_MS} AND timestamp <= {END_MS}
),
grid AS (SELECT * FROM (VALUES {grid_values}) g(t)),
u AS (
    SELECT t AS ts, CAST(NULL AS DOUBLE) AS v, 1 AS is_grid FROM grid
    UNION ALL
    SELECT timestamp AS ts, CAST(v AS DOUBLE) AS v, 0 AS is_grid FROM series
),
filled AS (
    SELECT ts, is_grid,
        max(CASE WHEN is_grid = 0 THEN ts END) OVER w_before AS before_ts,
        last_value(CASE WHEN is_grid = 0 THEN v END IGNORE NULLS) OVER w_before AS before_v,
        min(CASE WHEN is_grid = 0 THEN ts END) OVER w_after AS after_ts,
        first_value(CASE WHEN is_grid = 0 THEN v END IGNORE NULLS) OVER w_after AS after_v,
        min(CASE WHEN is_grid = 0 THEN ts END) OVER () AS first_ts,
        max(CASE WHEN is_grid = 0 THEN ts END) OVER () AS last_ts
    FROM u
    WINDOW
      w_before AS (ORDER BY ts, is_grid ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      w_after AS (ORDER BY ts, is_grid ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT ts AS timestamp,
    CAST(CASE WHEN ts <= first_ts THEN coalesce(before_v, after_v)
              WHEN ts >= last_ts THEN coalesce(after_v, before_v)
              WHEN before_ts = ts THEN before_v
              ELSE round(before_v + (ts - before_ts) / (after_ts - before_ts) * (after_v - before_v))
         END AS BIGINT) AS messages
FROM filled WHERE is_grid = 1""",
        "b15_series_resampled_multi": f"""{c},
series AS (
    SELECT channel, timestamp, messages FROM channel_stats
    WHERE timestamp >= {START_MS} AND timestamp <= {END_MS}
),
grid AS (SELECT * FROM (VALUES {grid_values}) g(t)),
chans AS (SELECT DISTINCT channel FROM series),
u AS (
    SELECT c.channel, g.t AS ts, CAST(NULL AS DOUBLE) AS v, 1 AS is_grid
    FROM chans c CROSS JOIN grid g
    UNION ALL
    SELECT channel, timestamp AS ts, CAST(messages AS DOUBLE) AS v, 0 AS is_grid
    FROM series
),
filled AS (
    SELECT channel, ts, is_grid,
        max(CASE WHEN is_grid = 0 THEN ts END) OVER w_before AS before_ts,
        last_value(CASE WHEN is_grid = 0 THEN v END IGNORE NULLS) OVER w_before AS before_v,
        min(CASE WHEN is_grid = 0 THEN ts END) OVER w_after AS after_ts,
        first_value(CASE WHEN is_grid = 0 THEN v END IGNORE NULLS) OVER w_after AS after_v,
        min(CASE WHEN is_grid = 0 THEN ts END) OVER w_all AS first_ts,
        max(CASE WHEN is_grid = 0 THEN ts END) OVER w_all AS last_ts
    FROM u
    WINDOW
      w_before AS (PARTITION BY channel ORDER BY ts, is_grid
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      w_after AS (PARTITION BY channel ORDER BY ts, is_grid
                  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING),
      w_all AS (PARTITION BY channel)
)
SELECT channel, ts AS timestamp,
    CAST(CASE WHEN ts <= first_ts THEN coalesce(before_v, after_v)
              WHEN ts >= last_ts THEN coalesce(after_v, before_v)
              WHEN before_ts = ts THEN before_v
              ELSE round(before_v + (ts - before_ts) / (after_ts - before_ts) * (after_v - before_v))
         END AS BIGINT) AS messages
FROM filled WHERE is_grid = 1""",
        "b16_empty_series_default": f"""{c},
series AS (
    SELECT timestamp, messages FROM channel_stats
    WHERE channel = '__no_such_channel__'
      AND timestamp >= {START_MS} AND timestamp <= {END_MS}
)
SELECT timestamp, messages FROM series
UNION ALL
SELECT * FROM (VALUES ({START_MS}, CAST(0 AS BIGINT)),
                      ({END_MS}, CAST(0 AS BIGINT))) f(timestamp, messages)
WHERE (SELECT count(*) FROM series) = 0""",
        "b19_dynamic_sort": f"""{c}
SELECT e.emote, CAST(e.type AS SMALLINT) AS type, s.occurrences
FROM emotes e
JOIN (
    SELECT emote, count(*) AS occurrences FROM emote_occurrences
    WHERE channel = '{CHANNEL}' GROUP BY emote
) s ON s.emote = e.emote""",
        "b20_emotes_per_channel_json": f"""{c}
SELECT channel,
       '{{' || string_agg('"' || emote || '":' || occurrences, ',' ORDER BY emote)
            || '}}' AS emotes_json
FROM (
    SELECT channel, emote, count(*) AS occurrences
    FROM emote_occurrences GROUP BY 1, 2
)
WHERE channel IN (SELECT channel FROM channels_dim WHERE hidden IS false)
GROUP BY channel""",
        "b22_legacy_deviation": f"""{c}
SELECT channel, n_users,
       CASE WHEN n_users > 1 THEN sqrt(sum_sq / (n_users - 1)) END AS deviation
FROM (
    SELECT channel, count(*) AS n_users, sum(pow(x, 2)) AS sum_sq
    FROM (
        SELECT channel, username, CAST(sum(messages) AS BIGINT) AS x
        FROM user_stats WHERE timestamp > 0 GROUP BY channel, username
    ) GROUP BY channel
)""",
        # the full channel-page payload: long-format union of the message
        # series + each visualized emote series, cumulative with the
        # pre-window base, resampled per series (mirrors the Spark plan
        # stage for stage; same interpolation SQL as b15_*_multi)
        "channel_page_single_plan": f"""{c},
allseries AS (
    SELECT 'messages' AS series, timestamp, CAST(messages AS DOUBLE) AS v
    FROM channel_stats WHERE channel = '{CHANNEL}'
    UNION ALL
    SELECT emote AS series, timestamp, CAST(occurrences AS DOUBLE) AS v
    FROM emote_stats WHERE channel = '{CHANNEL}'
      AND emote IN ({', '.join(f"'{e}'" for e in VIS_EMOTES)})
),
base AS (
    SELECT series, sum(v) AS b FROM allseries
    WHERE timestamp > 0 AND timestamp < {START_MS} GROUP BY series
),
cum AS (
    SELECT i.series, i.timestamp,
           coalesce(b.b, 0.0) + sum(i.v) OVER (PARTITION BY i.series
               ORDER BY i.timestamp
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value
    FROM allseries i LEFT JOIN base b USING (series)
    WHERE i.timestamp >= {START_MS} AND i.timestamp <= {END_MS}
),
grid AS (SELECT * FROM (VALUES {grid_values}) g(t)),
sk AS (SELECT DISTINCT series FROM cum),
u AS (
    SELECT s.series, g.t AS ts, CAST(NULL AS DOUBLE) AS v, 1 AS is_grid
    FROM sk s CROSS JOIN grid g
    UNION ALL
    SELECT series, timestamp AS ts, value AS v, 0 AS is_grid FROM cum
),
filled AS (
    SELECT series, ts, is_grid,
        max(CASE WHEN is_grid = 0 THEN ts END) OVER w_before AS before_ts,
        last_value(CASE WHEN is_grid = 0 THEN v END IGNORE NULLS) OVER w_before AS before_v,
        min(CASE WHEN is_grid = 0 THEN ts END) OVER w_after AS after_ts,
        first_value(CASE WHEN is_grid = 0 THEN v END IGNORE NULLS) OVER w_after AS after_v,
        min(CASE WHEN is_grid = 0 THEN ts END) OVER w_all AS first_ts,
        max(CASE WHEN is_grid = 0 THEN ts END) OVER w_all AS last_ts
    FROM u
    WINDOW
      w_before AS (PARTITION BY series ORDER BY ts, is_grid
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      w_after AS (PARTITION BY series ORDER BY ts, is_grid
                  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING),
      w_all AS (PARTITION BY series)
)
SELECT series, ts AS timestamp,
    CAST(CASE WHEN ts <= first_ts THEN coalesce(before_v, after_v)
              WHEN ts >= last_ts THEN coalesce(after_v, before_v)
              WHEN before_ts = ts THEN before_v
              ELSE round(before_v + (ts - before_ts) / (after_ts - before_ts) * (after_v - before_v))
         END AS BIGINT) AS value
FROM filled WHERE is_grid = 1""",
        # the denominator window sum runs BEFORE the bot anti-filter —
        # the reference's :335-340 total includes bots while its
        # :348-351 rows exclude them (quirk, review r12)
        "b18_pct_of_total": f"""{c}
SELECT username, occurrences,
       CAST(100.0 AS DOUBLE) * occurrences / total AS pct,
       CAST(row_number() OVER (
           ORDER BY occurrences DESC, username ASC) AS INT) AS rank
FROM (
    SELECT username, occurrences, sum(occurrences) OVER () AS total
    FROM (
        SELECT username, count(*) AS occurrences FROM emote_occurrences
        WHERE channel = '{CHANNEL}' AND emote = '{EMOTE}' GROUP BY username
    )
) WHERE username NOT IN ({bots})""",
    }
