"""Serving-store layout: partitioned + bucketed fact tables for
shuffle-free reads at scale (SURVEY.md §4.1 "index-backed serving").

The reference's serving index is the Postgres PK ``(dims..., timestamp)``
(e.g. UserEmoteStatsAggregation.java:44). The Spark-native equivalent is
physical layout:

- **partition by channel** — dashboard queries are channel-scoped, so
  partition pruning turns every per-channel read into a single-directory
  scan (the analog of the PK's leading column);
- **bucket by the join/group key** — two tables bucketed the same way
  join/aggregate WITHOUT a shuffle (buckets are co-located by
  construction), the cluster-scale answer to "every groupBy is a
  shuffle". Bucketing requires the table catalog (``saveAsTable``),
  which is also how a warehouse would serve these tables.

At 100 TB: partition count = |channels| (thousands — fine); bucket count
sized so a bucket of the largest channel fits an executor core's memory
(e.g. 512 buckets ≈ 200 MB each at 100 GB/channel of stats rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    partition_by: str = "channel",
    bucket_by: tuple[str, ...] = ("username",),
    num_buckets: int = 8,
    mode: str = "overwrite",
) -> None:
    """Write a fact DataFrame as a partitioned, bucketed, sorted catalog
    table. Bucket columns must be the downstream join/agg key."""
    (
        df.write.mode(mode)
        .partitionBy(partition_by)
        .bucketBy(num_buckets, *bucket_by)
        .sortBy(*bucket_by)
        .format("parquet")
        .saveAsTable(table)
    )


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
