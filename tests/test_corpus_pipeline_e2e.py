"""End-to-end curation pipeline: the LLM-data operators COMPOSE —
quality gate -> exact-substring rewrite -> near-dup cluster dedup ->
temperature mixture -> globally-ordered epoch shards. Each stage's
output feeds the next as a plain DataFrame; the assertions pin the
invariants a real corpus build relies on (monotone shrinkage, designed
duplicates eliminated, deterministic replay)."""

from __future__ import annotations

from pyspark.sql import functions as F

from twitch_chat_analyser_spark import storage
from twitch_chat_analyser_spark.operators import (
    dedup,
    graph,
    sampling,
    textops,
)

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"

# 7 shared tokens (with 2 distinct stopwords for the quality gate's
# stopword rule) -> three duplicated 5-gram spans across every doc, but
# only ~0.23 Jaccard between distinct docs (far under the 0.5 near-dup
# threshold)
PREFIX = "the quick brown fox and the dog"


def _doc(i: int, tag: str) -> str:
    body = " ".join(f"{tag}{i}w{j}" for j in range(12))
    return f"{PREFIX} {body}"


def _corpus(spark):
    rows = []
    for i in range(20):  # web: distinct docs
        t = _doc(i, "web")
        rows.append((i, t, "en", "web", len(t)))
    for k in range(5):  # near-dup copies of web docs 0..4 (tail edit)
        t = _doc(k, "web") + " extra"
        rows.append((50 + k, t, "en", "web", len(t)))
    for i in range(10):  # books: distinct docs
        t = _doc(i, "book")
        rows.append((100 + i, t, "en", "books", len(t)))
    # junk the quality gate must drop: too short / symbol soup
    rows.append((200, "x", "en", "web", 1))
    rows.append((201, "!! ?? ** ++ --", "en", "web", 14))
    return spark.createDataFrame(rows, DOC_SCHEMA)


def test_full_curation_pipeline_composes(spark, tmp_path):
    docs = _corpus(spark)
    n0 = docs.count()
    assert n0 == 37

    # 1. hard quality gate: exactly the two junk docs drop
    flags = textops.quality_rule_flags(docs)
    good = docs.join(
        flags.filter("quality_pass").select("doc_id"), "doc_id", "left_semi"
    )
    n1 = good.count()
    assert n1 == 35

    # 2. exact-substring span rewrite: the shared prefix's 5-grams are
    # duplicated across docs -> only their global first occurrence keeps
    # them; the rewrite never drops documents
    rewritten = dedup.remove_duplicate_spans(good, shingle_k=5)
    assert rewritten.count() == n1
    tot = rewritten.agg(
        F.sum("n_tokens").alias("before"), F.sum("n_kept").alias("after")
    ).collect()[0]
    assert tot["after"] < tot["before"]
    # at least one doc keeps the prefix verbatim (its first occurrence)
    assert rewritten.filter(F.col("n_removed") == 0).count() >= 1

    # 3. near-dup clusters (minhash) -> drop non-survivors: exactly the
    # five designed tail-edit copies
    pairs = dedup.minhash_dedup_pairs(good, 8, 3, 0.5, sort=False)
    clusters = graph.dedup_clusters(good, pairs)
    deduped = good.join(
        clusters.filter(~F.col("is_survivor")).select("doc_id"),
        "doc_id",
        "left_anti",
    )
    n2 = deduped.count()
    assert n2 == 30
    kept_ids = {r["doc_id"] for r in deduped.select("doc_id").collect()}
    assert all(50 + k not in kept_ids for k in range(5))
    # keep-best policy agrees on cluster membership
    reps = graph.cluster_representatives(
        good, pairs, textops.quality_score(good)
    ).collect()
    assert len(reps) == 5 and all(r["cluster_size"] == 2 for r in reps)

    # 4. temperature mixture across the two sources: the small source
    # is up-weighted (keep-rate ~0.99 vs web ~0.70), both survive
    mixed = sampling.mixture_temperature(deduped, tau=0.5, budget_fraction=0.8)
    n3 = mixed.count()
    assert 0 < n3 <= n2
    srcs = {r["source"] for r in mixed.select("source").distinct().collect()}
    assert srcs == {"web", "books"}

    # 5. materialize the epoch order as globally sorted shards
    final = deduped.join(mixed.select("doc_id"), "doc_id", "left_semi")
    out = str(tmp_path / "shards")
    storage.write_training_shards(final, out, epoch=0, shards=2)
    back = spark.read.parquet(out)
    assert back.count() == n3
    ranks = sorted(r["shuffle_rank"] for r in back.collect())
    assert ranks == list(range(1, n3 + 1))

    # deterministic end to end: the mixture re-selects the same docs
    again = sampling.mixture_temperature(deduped, tau=0.5, budget_fraction=0.8)
    assert sorted(r["doc_id"] for r in again.collect()) == sorted(
        r["doc_id"] for r in mixed.collect()
    )
