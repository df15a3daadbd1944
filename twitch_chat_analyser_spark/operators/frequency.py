"""Frequency-sketch family: count-min sketch, bitmap-index exact
distinct, and approx-top-k heavy hitters.

The reference has no approximate aggregates (SURVEY §2.D) — its
frequency questions (top chatters `MainController.php:175-178`, top
emotes `:194-197`) are exact GROUP BY over pre-aggregated facts. These
operators add the 100 TB path for the same questions:

- **Count-min sketch** — a fixed-size `(depth × width)` counter table
  answering "how often did item X occur?" with one-sided error. Built
  here as plain DataFrame ops over a *portable* hash (md5 hex prefix),
  so the DuckDB oracle reconstructs the *identical* sketch and the
  estimates hash-match exactly. Mergeable: two sketches add cell-wise,
  so per-partition/per-day sketches re-aggregate without raw data —
  same continuous-aggregate idea as operators/sketches.py (HLL), for
  point frequencies instead of distinct counts. (Spark also ships a
  `count_min_sketch` aggregate; its binary layout is JVM-internal,
  which is why the portable rebuild is the oracle-checkable surface.)
- **Bitmap distinct** — Spark's `bitmap_bucket_number` /
  `bitmap_bit_position` / `bitmap_construct_agg` / `bitmap_or_agg` /
  `bitmap_count` family: EXACT distinct counting over integer keys that
  is partial-mergeable (bitmaps OR losslessly), unlike COUNT(DISTINCT)
  which must re-shuffle raw keys per question. The scale pattern:
  persist per-(dims, day, bucket) bitmaps once, answer any coarser
  rollup by OR-merging — exact where HLL is approximate.
- **Heavy hitters** — `approx_top_k` (SQL aggregate, Spark 4.x): one
  pass, bounded memory, no full-key shuffle. At test scale
  `maxItemsTracked` exceeds the vocabulary so counts are exact and the
  oracle is plain GROUP BY top-k with a deterministic tie-break.

All three stay entirely in JVM built-ins — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import ingest

# Count-min geometry. Width 1024 × depth 4 = 4 KiB of counters per
# sketch regardless of input size; error bound ~ 2e/width of the L1
# mass per estimate, one-sided (never under-counts).
CMS_WIDTH = 1024
CMS_DEPTH = 4

DAY_MS = 86_400_000

# Heavy-hitter parameters: report TOP_K, track far more than the test
# vocabulary so tracked counts are exact, and over-fetch OVERFETCH
# candidates so the deterministic (count DESC, word ASC) re-rank sees
# the entire tie-group at the TOP_K boundary.
TOP_K = 25
OVERFETCH = 1000
MAX_TRACKED = 200_000


def _cms_bucket(item: Column, d: int) -> Column:
    """Row of hash functions: bucket of ``item`` under depth-``d``'s
    hash. md5-prefix → 32-bit int is deliberately *portable* (identical
    in DuckDB) unlike `xxhash64`/`hash`, whose seeds are JVM-specific.
    """
    h = F.conv(
        F.substring(F.md5(F.concat_ws(":", F.lit(str(d)), item)), 1, 8), 16, 10
    )
    return (h.cast("long") % CMS_WIDTH).alias("bucket")


def _cms_pairs(item: Column) -> Column:
    """array<struct<d,bucket>> of all depth rows for one item — lets
    the build explode in a single scan instead of depth× re-reads."""
    return F.array(
        *[
            F.struct(F.lit(d).alias("d"), _cms_bucket(item, d).alias("bucket"))
            for d in range(CMS_DEPTH)
        ]
    )


def cms_build(df: DataFrame, col: str) -> DataFrame:
    """Build the sketch: one scan, explode to (d, bucket), count.

    -> d INT, bucket BIGINT, cnt BIGINT  (≤ depth × width rows, ever)

    Mergeable: union two sketch tables and re-sum (d, bucket) — the
    basis for per-day persisted sketches at scale.
    """
    return (
        df.select(F.explode(_cms_pairs(F.col(col))).alias("p"))
        .groupBy(F.col("p.d").alias("d"), F.col("p.bucket").alias("bucket"))
        .agg(F.count("*").alias("cnt"))
    )


def cms_merge(sketches: DataFrame) -> DataFrame:
    """Cell-wise sum of stacked sketch tables (same geometry)."""
    return sketches.groupBy("d", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(sketch: DataFrame, probes: DataFrame, col: str) -> DataFrame:
    """Point-estimate every probe item: min over depth rows of its
    bucket counters. The sketch side is ≤ 4096 rows — broadcast, so
    estimation is a map-side join however many probes stream through.

    -> <col>, cms_estimate BIGINT
    """
    pb = probes.select(
        F.col(col), F.explode(_cms_pairs(F.col(col))).alias("p")
    ).select(col, "p.d", "p.bucket")
    return (
        pb.join(F.broadcast(sketch), ["d", "bucket"], "left")
        .groupBy(col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("cms_estimate"))
    )


def user_frequency_cms(messages: DataFrame) -> DataFrame:
    """Estimated per-user message counts via the sketch: build over the
    username stream, then estimate for every distinct username.

    -> username, cms_estimate
    """
    sketch = cms_build(messages, "username")
    probes = messages.select("username").distinct()
    return cms_estimate(sketch, probes, "username")


# --------------------------------------------------------------------------
# Bitmap exact distinct
# --------------------------------------------------------------------------


def daily_user_bitmaps(events: DataFrame) -> DataFrame:
    """Persisted base table: one bitmap of the distinct user_id set per
    (channel, day, bitmap-bucket). The only pass over raw events; every
    coarser distinct-count rollup below merges these.

    -> channel, day_ms, bucket, bm (binary bitmap)
    """
    return (
        events.select(
            F.col("event_type").alias("channel"),
            F.expr(f"(unix_millis(ts) div {DAY_MS}) * {DAY_MS}").alias("day_ms"),
            F.expr("bitmap_bucket_number(user_id)").alias("bucket"),
            F.expr("bitmap_bit_position(user_id)").alias("pos"),
        )
        .groupBy("channel", "day_ms", "bucket")
        .agg(F.expr("bitmap_construct_agg(pos)").alias("bm"))
    )


def merge_bitmap_distinct(bitmaps: DataFrame, dims: list[str]) -> DataFrame:
    """Re-aggregate persisted bitmaps to any coarser grouping — OR the
    bitmaps per bucket, popcount, sum across buckets. Exact (buckets
    partition the integer key space), no raw-data re-scan.

    -> *dims, distinct_users BIGINT
    """
    return (
        bitmaps.groupBy(*dims, "bucket")
        .agg(F.expr("bitmap_or_agg(bm)").alias("bm"))
        .groupBy(*dims)
        .agg(F.sum(F.expr("bitmap_count(bm)")).alias("distinct_users"))
    )


def channel_distinct_users_bitmap(events: DataFrame) -> DataFrame:
    """Per-channel all-time exact distinct users, computed the scale
    way: daily bitmaps → OR-merge per channel.

    -> channel, distinct_users
    """
    return merge_bitmap_distinct(daily_user_bitmaps(events), ["channel"])


# --------------------------------------------------------------------------
# Heavy hitters (approx_top_k)
# --------------------------------------------------------------------------


def heavy_hitter_words(messages: DataFrame) -> DataFrame:
    """Global top-K message words by occurrence via `approx_top_k` —
    single aggregate, bounded state, no full-vocabulary shuffle. The
    sketch's own output order is implementation-internal, so the final
    rank is re-derived deterministically (count DESC, word ASC) from an
    over-fetched candidate set.

    -> word, occurrences, rank
    """
    words = messages.select(
        F.explode(F.split("message", r"\s+")).alias("word")
    ).filter(F.length("word") > 0)
    tk = words.agg(
        F.expr(f"approx_top_k(word, {OVERFETCH}, {MAX_TRACKED})").alias("tk")
    )
    from pyspark.sql.window import Window

    return (
        tk.select(F.explode("tk").alias("e"))
        .select(
            F.col("e.item").alias("word"),
            F.col("e.count").alias("occurrences"),
        )
        .withColumn(
            "rank",
            F.row_number().over(
                Window.orderBy(F.desc("occurrences"), F.asc("word"))
            ),
        )
        .filter(F.col("rank") <= TOP_K)
    )


# --------------------------------------------------------------------------
# registry entries
# --------------------------------------------------------------------------


def _q_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    return user_frequency_cms(ingest.messages(spark, sf_dir))


def _q_bitmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    return channel_distinct_users_bitmap(ingest.load(spark, sf_dir, "events"))


def _q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    return heavy_hitter_words(ingest.messages(spark, sf_dir))


FREQUENCY_QUERIES = {
    "cms_user_frequency": _q_cms,
    "bitmap_distinct_users": _q_bitmap,
    "heavy_hitter_words": _q_heavy_hitters,
}


def _cms_bucket_sql(item: str, d: int) -> str:
    return (
        f"('0x' || substr(md5('{d}:' || {item}), 1, 8))::BIGINT % {CMS_WIDTH}"
    )


def frequency_oracles() -> dict[str, str]:
    from ..registry import chat_ctes

    c = chat_ctes()
    cms_rows = "\n    UNION ALL\n".join(
        f"    SELECT {d} AS d, {_cms_bucket_sql('username', d)} AS bucket"
        f" FROM messages"
        for d in range(CMS_DEPTH)
    )
    probe_rows = "\n    UNION ALL\n".join(
        f"    SELECT username, {d} AS d,"
        f" {_cms_bucket_sql('username', d)} AS bucket FROM probes"
        for d in range(CMS_DEPTH)
    )
    return {
        "cms_user_frequency": f"""{c},
cms AS (
    SELECT d, bucket, count(*) AS cnt FROM (
{cms_rows}
    ) GROUP BY d, bucket
),
probes AS (SELECT DISTINCT username FROM messages),
pb AS (
{probe_rows}
)
SELECT pb.username, min(coalesce(cms.cnt, 0)) AS cms_estimate
FROM pb LEFT JOIN cms USING (d, bucket)
GROUP BY pb.username""",
        "bitmap_distinct_users": """
SELECT event_type AS channel, count(DISTINCT user_id) AS distinct_users
FROM events GROUP BY 1""",
        "heavy_hitter_words": f"""{c},
counts AS (
    -- the shared `words` CTE tokenizes messages (column named `emote`)
    SELECT emote AS word, count(*) AS occurrences FROM words
    WHERE len(emote) > 0 GROUP BY 1
)
SELECT word, occurrences,
       CAST(row_number() OVER (ORDER BY occurrences DESC, word) AS INT)
           AS rank
FROM counts
QUALIFY rank <= {TOP_K}""",
    }
