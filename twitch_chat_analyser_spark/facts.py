"""Materialized shared fact tables — the serving-layer cache for the
correctness gate and any interactive consumer of the query registry.

The reference separates write and read paths: Flink maintains the five
fact tables in Postgres and every dashboard query reads the MATERIALIZED
facts (MainController.php never touches raw messages). The registry's
query callables, by contrast, are pure functions from raw parquet — run
back-to-back in one session, ~45 of them would re-derive the same five
aggregations from the events scan every time, an engine-level N+1.

:func:`warm` restores the reference's architecture: it registers the
shared relations (messages + the five fact tables) in Spark's
CacheManager. Substitution is by canonicalized plan equality
(``CacheManager.useCachedData``), so EVERY later query whose plan
contains one of these relations — however it was built — reads the
materialized InMemoryRelation instead of recomputing; no call-site
changes anywhere. First touch materializes each relation once.

Scale note (100 TB): this is the local stand-in for the real serving
layer — fact tables maintained incrementally by the streaming write path
(streaming/pipeline.py) and stored partitioned by channel/time, which
reads then scan with partition pruning. In-memory caching of the facts
themselves remains valid at scale because the AGGREGATES are orders of
magnitude smaller than raw events (window-bucket cardinality, not
message cardinality).

Wired into ``__spark_entry__`` (driver gate) only: ``registry.queries()``
stays uncached so plan-shape tests and bench.py measure the raw plans.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from . import dims, ingest
from .operators import aggregations as agg

_WARMED: set[tuple[str, str]] = set()


def warm(spark: SparkSession, sf_dir: str) -> None:
    """Idempotent per (session, sf_dir): mark the shared relations
    cacheable. Lazy — nothing materializes until a query touches it.
    Each relation family is guarded independently: a dataset carrying
    only the chat tables (no documents/embeddings) still warms the chat
    facts, and a failed registration never poisons the others — the
    cache is an optimization, absence of a table is the query's own
    error to raise."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if key in _WARMED:
        return
    _WARMED.add(key)
    # serving-profile session tuning (performance-only, runtime-safe):
    # AQE coalesces the tiny post-shuffle partitions small-SF serving
    # queries produce — without it every aggregate pays a full-width
    # task wave. No-op when the host session already enables it
    # (session.get_spark does).
    for k, v in (
        ("spark.sql.adaptive.enabled", "true"),
        ("spark.sql.adaptive.coalescePartitions.enabled", "true"),
    ):
        try:
            spark.conf.set(k, v)
        except Exception:
            pass
    from .operators import dedup, llmops, similarity

    def chat():
        msgs = ingest.messages(spark, sf_dir)
        emotes = dims.emotes_df(spark)
        return [
            msgs,
            agg.channel_stats(msgs),
            agg.user_stats(msgs),
            agg.emote_stats(msgs, emotes),
            agg.user_emote_stats(msgs, emotes),
            agg.phrase_stats(msgs, dims.phrases_df(spark)),
        ]

    def documents():
        from .operators import textops

        docs = ingest.load(spark, sf_dir, "documents")
        return [
            # shared quality features: text_quality_score, corpus_prep,
            # and sample_quality_top_fraction all contain this relation
            # (or a projection of it) as a subtree
            textops.quality_score(docs),
            # shared dedup machinery: three registry queries (minhash,
            # ngram, connected-clusters) derive from this band join
            dedup.lsh_candidate_pairs(
                dedup.minhash_signatures(
                    docs, llmops.NUM_HASHES, llmops.SHINGLE_K
                )
            ),
            # unsorted: the sorted dedup_minhash_lsh plan CONTAINS this
            # as a subtree (Sort over the cached relation), and the
            # clusters query consumes it order-free — one entry, both
            dedup.minhash_dedup_pairs(
                docs,
                llmops.NUM_HASHES,
                llmops.SHINGLE_K,
                llmops.MINHASH_JACCARD_THRESHOLD,
                sort=False,
            ),
        ]

    def embeddings():
        # cast+norm projection shared by the whole ANN family
        emb = ingest.load(spark, sf_dir, "embeddings")
        return [similarity.as_double_vec(emb)]

    for family in (chat, documents, embeddings):
        try:
            for df in family():
                df.cache()
        except Exception as exc:
            # partial dataset: skip this family's cache — queries over
            # the missing tables will raise their own (clearer) error;
            # don't let a cache optimization mask or preempt it
            import warnings

            warnings.warn(
                f"facts.warm: skipping {family.__name__} cache ({exc})",
                stacklevel=2,
            )
