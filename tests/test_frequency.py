"""Frequency-sketch family: count-min, bitmap distinct, heavy hitters.

Pins the properties the oracle can't express: sketch mergeability
(split-build-merge == whole-build), the one-sided CMS error bound, and
bitmap OR-merge re-aggregation equaling exact COUNT(DISTINCT).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from twitch_chat_analyser_spark import ingest
from twitch_chat_analyser_spark.operators import frequency as fr


def test_cms_never_undercounts_and_is_mostly_exact(spark, sf_dir):
    msgs = ingest.messages(spark, sf_dir).cache()
    est = fr.user_frequency_cms(msgs)
    truth = msgs.groupBy("username").agg(F.count("*").alias("n"))
    joined = est.join(truth, "username").cache()
    # CMS error is one-sided: estimate >= true count, always.
    assert joined.filter(F.col("cms_estimate") < F.col("n")).count() == 0
    # At sf0.001 cardinality (~hundreds of users in 4x1024 cells) most
    # estimates should be collision-free.
    total = joined.count()
    exact = joined.filter(F.col("cms_estimate") == F.col("n")).count()
    assert exact >= 0.9 * total
    joined.unpersist()
    msgs.unpersist()


def test_cms_merge_equals_whole_build(spark, sf_dir):
    msgs = ingest.messages(spark, sf_dir).cache()
    whole = fr.cms_build(msgs, "username")
    a = fr.cms_build(msgs.filter(F.col("timestamp") % 2 == 0), "username")
    b = fr.cms_build(msgs.filter(F.col("timestamp") % 2 == 1), "username")
    merged = fr.cms_merge(a.unionByName(b))
    assert merged.exceptAll(whole).count() == 0
    assert whole.exceptAll(merged).count() == 0
    msgs.unpersist()


def test_bitmap_distinct_matches_exact(spark, sf_dir):
    events = ingest.load(spark, sf_dir, "events").cache()
    got = {
        r["channel"]: r["distinct_users"]
        for r in fr.channel_distinct_users_bitmap(events).collect()
    }
    want = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert got == want
    events.unpersist()


def test_bitmap_merge_across_days_deduplicates(spark, sf_dir):
    # A user active on many days must count once after the OR-merge:
    # global distinct == exact, not the sum of daily distincts.
    events = ingest.load(spark, sf_dir, "events").cache()
    daily = fr.daily_user_bitmaps(events)
    merged_all = fr.merge_bitmap_distinct(
        daily.withColumn("all", F.lit(1)), ["all"]
    ).collect()[0]["distinct_users"]
    exact = events.select("user_id").distinct().count()
    daily_sum = (
        fr.merge_bitmap_distinct(daily, ["channel", "day_ms"])
        .agg(F.sum("distinct_users"))
        .collect()[0][0]
    )
    assert merged_all == exact
    assert daily_sum > exact  # proves the merge actually deduplicates
    events.unpersist()


def test_heavy_hitters_are_exact_top_k(spark, sf_dir):
    msgs = ingest.messages(spark, sf_dir).cache()
    got = fr.heavy_hitter_words(msgs).orderBy("rank").collect()
    words = msgs.select(
        F.explode(F.split("message", r"\s+")).alias("word")
    ).filter(F.length("word") > 0)
    want = (
        words.groupBy("word")
        .agg(F.count("*").alias("occurrences"))
        .orderBy(F.desc("occurrences"), F.asc("word"))
        .limit(fr.TOP_K)
        .collect()
    )
    assert [(r["word"], r["occurrences"]) for r in got] == [
        (r["word"], r["occurrences"]) for r in want
    ]
    assert [r["rank"] for r in got] == list(range(1, fr.TOP_K + 1))
    msgs.unpersist()


def test_bloom_no_false_negatives_and_merge(spark):
    keys = spark.createDataFrame(
        [(f"key-{i}",) for i in range(200)], "k string"
    )
    bits = fr.bloom_build(keys, "k")
    # every inserted key must probe positive (no false negatives)
    probed = fr.bloom_maybe_contains(keys, bits, "k")
    assert probed.filter(F.col("maybe") == 0).count() == 0
    # merge property: filter(A ∪ B) == bits(A) UNION DISTINCT bits(B)
    a = keys.filter(F.col("k") < "key-2")
    b = keys.filter(F.col("k") >= "key-2")
    merged = fr.bloom_build(a, "k").union(fr.bloom_build(b, "k")).distinct()
    whole = set(r["pos"] for r in bits.collect())
    assert set(r["pos"] for r in merged.collect()) == whole


def test_bloom_overlap_bounds_exact_hits(spark):
    hist = spark.createDataFrame(
        [(0, "a b c d e f g", "en", "s", 13), (2, "h i j k l m n", "en", "s", 13)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    probe = spark.createDataFrame(
        # doc 1 shares the full 5-gram window stream with doc 0; doc 3
        # shares nothing
        [(1, "a b c d e f g", "en", "s", 13), (3, "z y x w v u t", "en", "s", 13)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = {r["doc_id"]: r for r in fr.bloom_ngram_overlap(hist, probe).collect()}
    assert out[1]["exact_hits"] == out[1]["n_shingles"] == 3
    assert out[1]["bloom_hits"] == 3  # no false negatives
    assert out[3]["exact_hits"] == 0
    # one-sided error: bloom can only over-count
    for r in out.values():
        assert r["bloom_hits"] >= r["exact_hits"]
