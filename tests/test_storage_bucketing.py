"""Bucketed serving-store layout: bucket-co-located aggregation and
joins must plan WITHOUT a shuffle on the bucketed key, and channel
partitioning must prune."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from twitch_chat_analyser_spark import ingest, storage
from twitch_chat_analyser_spark.operators import aggregations as agg


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def bucketed_user_stats(spark, sf_dir):
    # spark.sql.warehouse.dir is a static conf; the shared test session
    # uses the default ./spark-warehouse (gitignored), dropped afterwards
    stats = agg.user_stats(ingest.messages(spark, sf_dir))
    storage.write_bucketed(
        stats, "user_stats_bucketed", "channel", ("username",), 4
    )
    yield storage.read_table(spark, "user_stats_bucketed")
    spark.sql("DROP TABLE IF EXISTS user_stats_bucketed")


def test_bucketed_agg_has_no_exchange(spark, bucketed_user_stats):
    """groupBy on the bucket key reads pre-clustered buckets: the plan
    must contain NO shuffle (Exchange) — the 100 TB win."""
    per_user = bucketed_user_stats.groupBy("username").agg(
        F.sum("messages").alias("m")
    )
    plan = plan_of(per_user)
    assert "Exchange" not in plan, plan[:1500]


def test_bucketed_self_join_has_no_exchange(spark, bucketed_user_stats):
    a = bucketed_user_stats.groupBy("username").agg(F.sum("messages").alias("ma"))
    b = bucketed_user_stats.groupBy("username").agg(F.max("timestamp").alias("mb"))
    plan = plan_of(a.join(b, "username"))
    assert "Exchange" not in plan, plan[:1500]


def test_partition_pruning_on_channel(spark, bucketed_user_stats):
    pruned = bucketed_user_stats.filter(F.col("channel") == "click")
    plan = plan_of(pruned)
    # partition filters appear as PartitionFilters on the scan, and the
    # scan must not list a pushed data filter for channel (it's a
    # partition column, pruned before IO)
    assert "PartitionFilters" in plan
    assert "click" in plan


def test_training_shards_are_globally_ordered(spark, tmp_path):
    docs = spark.createDataFrame(
        [(i, f"s{i % 3}") for i in range(200)], "doc_id long, source string"
    )
    out = str(tmp_path / "shards")
    storage.write_training_shards(docs, out, epoch=1, shards=4)
    back = spark.read.parquet(out).select(
        "shuffle_rank", "doc_id", F.input_file_name().alias("f")
    )
    rows = back.collect()
    # every doc exactly once, ranks are exactly 1..N
    assert sorted(r["shuffle_rank"] for r in rows) == list(range(1, 201))
    # shard rank ranges are disjoint and contiguous in file order
    by_file: dict = {}
    for r in rows:
        by_file.setdefault(r["f"], []).append(r["shuffle_rank"])
    spans = sorted((min(v), max(v)) for v in by_file.values())
    for (lo1, hi1), (lo2, _) in zip(spans, spans[1:]):
        assert hi1 < lo2, "shard rank ranges overlap"
    # rows inside each file are stored rank-ascending (parquet preserves
    # row order; the loader can stream without sorting)
    for f in by_file:
        in_file = [
            r["shuffle_rank"]
            for r in spark.read.parquet(f).select("shuffle_rank").collect()
        ]
        assert in_file == sorted(in_file)
    # the permutation is the epoch_shuffle order (deterministic)
    from twitch_chat_analyser_spark.operators.sampling import epoch_shuffle

    expected = {
        r["doc_id"]: r["shuffle_rank"]
        for r in epoch_shuffle(docs, 1).collect()
    }
    assert all(expected[r["doc_id"]] == r["shuffle_rank"] for r in rows)


def test_bucketed_results_match_unbucketed(spark, sf_dir, bucketed_user_stats):
    direct = agg.user_stats(ingest.messages(spark, sf_dir))
    got = sorted(
        tuple(r)
        for r in bucketed_user_stats.select(*direct.columns).collect()
    )
    want = sorted(tuple(r) for r in direct.collect())
    assert got == want
