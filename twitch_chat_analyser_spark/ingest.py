"""Sources: testdata table loaders + the events -> messages stream mapping.

The driver's ``events`` parquet plays the Kafka ``Message`` stream
(FIXTURES.md §4; reference wire record Message.java:11-14):

    timestamp := epoch-millis(ts)      (Message.java:28 epoch-ms parity)
    channel   := event_type            (5 distinct values = 5 channels)
    username  := 'user_' || user_id
    message   := documents.text joined on doc_id = event_id % 500

The text join is deterministic and total at every scale factor (doc_id
0..499 exist at all SFs). The joined ``documents`` slice is 500 rows —
broadcast, never shuffled; at 100 TB of events this join stays a
map-side broadcast hash join.

:func:`messages_cte_sql` renders the identical mapping as ANSI SQL for
the DuckDB oracle, so every downstream operator is compared on exactly
the same input relation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Number of document rows every SF is guaranteed to contain (sf0.001 has
# exactly 500); the message text mapping must be SF-independent.
DOC_MOD = 500

# 15-minute tumbling window, reference aggregation-interval
# (job.example.properties:14, AbstractStatsAggregation.java:70-71).
WINDOW_MS = 900_000
WINDOW_DURATION = "15 minutes"


# Timestamp columns in the testdata parquet come in mixed physical
# precisions: TIMESTAMP(NANOS) (scanned as long nanos under
# spark.sql.legacy.parquet.nanosAsLong) and TIMESTAMP(MICROS) without
# timezone (scanned as TIMESTAMP_NTZ). Normalize both to TimestampType
# with the UTC session zone: nanos are integer-divided to micros — the
# same truncation DuckDB applies — and NTZ wall-clock is interpreted as
# UTC, matching DuckDB's naive-UTC timestamps.
TS_COLUMNS = {
    "events": ["ts"],
    "lineitem": ["l_shipdate"],
    "orders": ["o_orderdate"],
}


# Tables whose downstream pipelines are CPU-bound in the scan stage
# (explode + regex, shingle hashing, vector folds). The testdata files
# are single-row-group parquet, so the scan is ONE task and everything
# fused into it runs on one core; a cheap round-robin repartition after
# the scan unlocks full-width map parallelism. Guarded on the actual
# scan partition count: at 100 TB (thousands of splits) this is a no-op,
# so no gratuitous shuffle is ever added at scale.
PARALLELIZE = {"events", "documents", "embeddings"}


# Plan cache: DataFrames are immutable logical plans and the testdata
# dirs never change, so the (session, dir, table, parallelize) plan is
# built once — repeat loads otherwise re-read parquet footers and pay a
# driver-side .rdd partition probe each (~0.2s/table, and every
# read-path query loads 1-3 tables).
_LOAD_CACHE: dict[tuple[str, str, str, bool], DataFrame] = {}


def load(
    spark: SparkSession, sf_dir: str, name: str, parallelize: bool | None = None
) -> DataFrame:
    if parallelize is None:
        parallelize = name in PARALLELIZE
    # applicationId (not id(spark)): a stopped-and-recreated session must
    # not resurrect plans bound to the dead one
    key = (spark.sparkContext.applicationId, sf_dir, name, parallelize)
    cached = _LOAD_CACHE.get(key)
    if cached is not None:
        return cached
    df = _load_uncached(spark, sf_dir, name, parallelize)
    _LOAD_CACHE[key] = df
    return df


def _load_uncached(
    spark: SparkSession, sf_dir: str, name: str, parallelize: bool
) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    dtypes = dict(df.dtypes)
    for c in TS_COLUMNS.get(name, []):
        if dtypes.get(c) == "bigint":
            # integer division — `/` would round through double and lose
            # precision above 2^53 ns
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
        elif dtypes.get(c) == "timestamp_ntz":
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    if parallelize:
        target = spark.sparkContext.defaultParallelism
        if df.rdd.getNumPartitions() < target:
            df = df.repartition(target)
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load(spark, sf_dir, name) for name in TABLES}


def messages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The normalized chat-message stream relation.

    Columns: ts TIMESTAMP, timestamp BIGINT (epoch ms), channel STRING,
    username STRING, message STRING.
    """
    events = load(spark, sf_dir, "events")
    # broadcast side: never repartition — the rows are collected to the
    # driver for the broadcast anyway, a pre-shuffle is pure overhead
    docs = (
        load(spark, sf_dir, "documents", parallelize=False)
        .filter(F.col("doc_id") < DOC_MOD)
        .select("doc_id", "text")
    )
    return (
        events.join(
            F.broadcast(docs), F.col("doc_id") == F.col("event_id") % DOC_MOD
        )
        .select(
            F.col("ts"),
            F.unix_millis("ts").alias("timestamp"),
            F.col("event_type").alias("channel"),
            F.concat(F.lit("user_"), F.col("user_id")).alias("username"),
            F.col("text").alias("message"),
        )
    )


def messages_cte_sql() -> str:
    """DuckDB SQL for exactly the relation :func:`messages` builds."""
    return f"""
    SELECT
        e.ts AS ts,
        epoch_ms(e.ts) AS timestamp,
        e.event_type AS channel,
        'user_' || e.user_id AS username,
        d.text AS message
    FROM events e
    JOIN documents d ON d.doc_id = e.event_id % {DOC_MOD}
    """
