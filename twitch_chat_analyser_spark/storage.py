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
    partition_by: str | None = "channel",
    bucket_by: tuple[str, ...] = ("username",),
    num_buckets: int = 8,
    mode: str = "overwrite",
) -> None:
    """Write a fact DataFrame as a partitioned, bucketed, sorted catalog
    table. Bucket columns must be the downstream join/agg key. Pass
    ``partition_by=None`` for tables with no natural partition column
    (e.g. hash-keyed postings): bucketing alone still gives co-located
    joins and bucket pruning on the bucket key."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(partition_by)
    (
        w.bucketBy(num_buckets, *bucket_by)
        .sortBy(*bucket_by)
        .format("parquet")
        .saveAsTable(table)
    )


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def write_training_shards(
    docs: DataFrame,
    path: str,
    epoch: int = 0,
    shards: int = 8,
    mode: str = "overwrite",
) -> None:
    """Materialize an epoch's GLOBAL training order as sorted parquet
    shards — the handoff from curation to the training loader. Order is
    the deterministic :func:`~twitch_chat_analyser_spark.operators.
    sampling.epoch_shuffle` permutation; layout is
    ``repartitionByRange(shuffle_rank)`` + ``sortWithinPartitions``, so
    shard ``i`` holds a contiguous rank range and rows inside each file
    are rank-ordered — GLOBALLY sorted output with no single global
    sort (the range exchange samples boundaries; each shard sorts
    locally). A loader streams shards in filename order and reads rows
    sequentially; ``shuffle_rank`` is persisted so the order is also
    recoverable from the data alone.

    At 100 TB: shards ≈ corpus_bytes / desired_shard_size; the only
    wide operations are the rank computation's range exchange and the
    final shard range exchange — both on the uniform md5 key, zero
    skew. The rank is computed ON the full rows (``global_row_number``
    carries every input column through), so there is no join back to
    the corpus and ``docs`` is scanned once.
    """
    from pyspark.sql import functions as F

    from .operators.analytics import global_row_number

    key = F.md5(
        F.concat(
            F.lit(f"epoch{epoch}:"), F.col("doc_id").cast("string")
        ).cast("binary")
    )
    ranked = global_row_number(
        docs.withColumn("_sk", key),
        [F.asc("_sk"), F.asc("doc_id")],
        out="shuffle_rank",
    ).drop("_sk")
    (
        ranked.repartitionByRange(shards, "shuffle_rank")
        .sortWithinPartitions("shuffle_rank")
        .write.mode(mode)
        .parquet(path)
    )


def compact(
    spark: SparkSession,
    path: str,
    target_rows_per_file: int = 1_000_000,
    sort_within_by: list[str] | None = None,
) -> int:
    """Compact a parquet directory's small files (the streaming upsert
    sink produces one file batch per trigger — the classic small-file
    problem; at 100 TB, scan cost is dominated by file-open/footer
    overhead long before bytes).

    Rewrites to ``ceil(rows / target_rows_per_file)`` files via an
    atomic directory swap (same pattern as the merge sinks). Pass
    ``sort_within_by`` (e.g. ``["channel", "timestamp"]``) to lay rows
    out sorted inside each file so parquet row-group min/max stats make
    selective scans skip — the file-level analog of the reference's
    serving PK index (SURVEY §4.1).

    Returns the new file count.
    """
    import math
    import os
    import shutil
    import uuid

    df = spark.read.parquet(path)
    n = df.count()
    n_files = max(1, math.ceil(n / target_rows_per_file))
    if sort_within_by:
        # range-partition on the sort key, then sort inside each file:
        # every file owns a disjoint key range, so min/max footer stats
        # prune whole files for selective predicates
        out = df.repartitionByRange(n_files, *sort_within_by)
        out = out.sortWithinPartitions(*sort_within_by)
    else:
        out = df.repartition(n_files)
    tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
    out.write.mode("overwrite").parquet(tmp)
    back = f"{path}.old-{uuid.uuid4().hex[:8]}"
    os.rename(path, back)
    os.rename(tmp, path)
    shutil.rmtree(back, ignore_errors=True)
    return n_files
