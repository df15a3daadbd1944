"""Streaming ingest deduplication (`dropDuplicatesWithinWatermark`).

The reference's ingest is at-least-once ABOVE the Kafka log: the bot's
producer retries can write a chat message twice (Bot.java:136 —
fire-and-forget send, no idempotent-producer config), and every
downstream count would then be inflated; the reference simply accepts
this. Spark closes the gap natively: watermark-scoped streaming
deduplication keeps one row per wire-identity key and expires dedup
state once the watermark passes — bounded memory, unlike a naive
`dropDuplicates` on a stream whose state grows forever.

Semantics: two records are duplicates when all four wire fields match
(Message.java:11-14 — there is no producer-assigned message id). State
per key lives until `watermark_delay` behind the max seen event time;
a duplicate arriving later than that is NOT caught (the price of
bounded state — at-least-once producers retry within seconds, so a
minutes-scale delay is orders of magnitude of slack).

Batch counterpart: plain `dropDuplicates(KEYS)` — same key set, so a
backfill over a dumped topic and the live stream agree.
"""

from __future__ import annotations

import os as _os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..operators.dedup import tokens as dtokens
from .pipeline import read_message_stream


def _has_history(path: str) -> bool:
    """True only when the history store holds COMMITTED parquet data.
    A crash during the very first batch's write can leave the directory
    with only ``_temporary`` staging debris; ``os.path.isdir`` would
    then route into an unconditional read that fails schema inference
    on EVERY checkpoint replay — the stream wedges until someone
    deletes the directory by hand (review r9)."""
    if not _os.path.isdir(path):
        return False
    for root, dirs, files in _os.walk(path):
        dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
        if any(f.endswith(".parquet") for f in files):
            return True
    return False

# Wire-identity of a message (Message.java:11-14): no synthetic id
# exists, the full record is the key.
DEDUP_KEYS = ["ts", "channel", "username", "message"]


def dedup_messages(messages: DataFrame) -> DataFrame:
    """Batch/backfill variant: exact dedup on the wire identity."""
    return messages.dropDuplicates(DEDUP_KEYS)


def dedup_messages_stream(
    stream: DataFrame, watermark_delay: str = "10 minutes"
) -> DataFrame:
    """Streaming variant with bounded state: dedup state for a key is
    dropped once the watermark (max event time - delay) passes it."""
    return stream.withWatermark("ts", watermark_delay).dropDuplicatesWithinWatermark(
        DEDUP_KEYS
    )


def start_dedup_stream(
    spark: SparkSession,
    source_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    watermark_delay: str = "10 minutes",
) -> StreamingQuery:
    """File-source → watermarked dedup → append parquet. The cleaned
    stream is what the five fact pipelines would consume in a
    duplicate-hostile deployment."""
    stream = read_message_stream(spark, source_dir)
    clean = dedup_messages_stream(stream, watermark_delay)
    return (
        clean.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


# --------------------------------------------------------------------------
# Cross-run incremental corpus dedup: history in STORAGE, not stream state
# --------------------------------------------------------------------------

DOC_SCHEMA = "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG"


def _dedup_against_history(
    spark: SparkSession, batch_df: DataFrame, fp_path: str, batch_id: int
) -> DataFrame:
    """Shared dedup core for the corpus-ingest sinks: fingerprint the
    batch (md5 of normalized text), keep the smallest doc_id per
    fingerprint IN-batch, then anti-join against the persistent
    fingerprint store.

    REPLAY SAFETY: the store is laid out as ``batch=<id>`` partitions
    and the history read EXCLUDES the current batch's own partition — a
    replayed batch that already wrote its fingerprints before the
    checkpoint committed would otherwise anti-join against itself,
    produce an empty survivor set, and overwrite its own committed
    output with nothing (silent data loss). Filtering on the discovered
    partition column also prunes the scan, so the exclusion is free.

    -> batch columns + fp (the new-unique rows only)
    """
    import os

    from pyspark.sql import functions as F

    from ..operators.dedup import norm_text

    hashed = batch_df.withColumn("fp", F.md5(norm_text()))
    keeper = hashed.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
    batch_unique = hashed.join(keeper, ["fp", "doc_id"], "left_semi")
    if _has_history(fp_path):
        seen = (
            spark.read.parquet(fp_path)
            .filter(F.col("batch") != batch_id)
            .select("fp")
        )
        return batch_unique.join(seen, "fp", "left_anti")
    return batch_unique


def _start_doc_stream(
    spark: SparkSession,
    docs_dir: str,
    checkpoint_dir: str,
    sink,
    max_files_per_trigger: int | None,
) -> StreamingQuery:
    """Document-stream reader + foreachBatch writer shared by the corpus
    ingest sinks."""
    stream = spark.readStream.schema(DOC_SCHEMA)
    if max_files_per_trigger:
        stream = stream.option("maxFilesPerTrigger", max_files_per_trigger)
    return (
        stream.parquet(docs_dir)
        .writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )


def start_incremental_corpus_dedup(
    spark: SparkSession,
    docs_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """Continuously-ingested training corpus with EXACT dedup against
    all history: each micro-batch is deduped in-batch (min doc_id per
    content fingerprint), anti-joined against the persistent fingerprint
    store, and the survivors appended to the corpus with their
    fingerprints added to the store.

    Scale design: `dropDuplicatesWithinWatermark` (above) bounds dedup
    to a time window because stream STATE must stay bounded; a corpus
    ingest needs dedup against ALL history, so the fingerprint set lives
    in the store instead — the same state-in-storage move the reference
    makes with Postgres accumulation (AbstractStatsAggregation.java:
    108-112). The anti-join is fingerprint-keyed (uniform md5 — no
    skew); at 100 TB the store is bucketed by fingerprint so the join
    co-locates without a shuffle of history.

    Exactly-once: survivors and fingerprints land in ``batch=<id>``
    subdirectories written with overwrite — a replayed batch rewrites
    the same paths bit-identically instead of appending twice.

    Layout: ``out_dir/corpus/batch=N/*.parquet`` (the deduped corpus)
    and ``out_dir/fingerprints/batch=N/*.parquet`` (fp + doc_id).
    """
    import os

    corpus_path = os.path.join(out_dir, "corpus")
    fp_path = os.path.join(out_dir, "fingerprints")

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        fresh = _dedup_against_history(spark, batch_df, fp_path, batch_id)
        fresh = fresh.cache()
        try:
            fresh.drop("fp").write.mode("overwrite").parquet(
                os.path.join(corpus_path, f"batch={batch_id}")
            )
            fresh.select("fp", "doc_id").write.mode("overwrite").parquet(
                os.path.join(fp_path, f"batch={batch_id}")
            )
        finally:
            fresh.unpersist()

    return _start_doc_stream(
        spark, docs_dir, checkpoint_dir, sink, max_files_per_trigger
    )


# --------------------------------------------------------------------------
# Full streaming corpus preparation: quality gate + exact dedup vs ALL
# history + per-batch yield metrics — llmops.corpus_prep's pipeline
# (quality filter -> dedup -> token accounting) run continuously.
# --------------------------------------------------------------------------


def start_corpus_prep_stream(
    spark: SparkSession,
    docs_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    min_quality: float = 0.2,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """Continuously prepare a training corpus from a document stream:
    per micro-batch, (1) score and drop below-``min_quality`` documents
    (``textops.quality_score`` — the same scorer the batch
    ``llmops.corpus_prep`` uses), (2) exact-dedup in-batch and against
    the persistent fingerprint store, (3) append survivors + their
    fingerprints, and (4) record a per-batch yield-metrics row
    (docs in / past quality / new-unique, surviving token count) — the
    operational telemetry a corpus ingest runs on (yield collapse =
    upstream duplication or quality regression).

    Composition equivalence: corpus ∪ over all batches equals the batch
    pipeline's quality+dedup survivor set on the same input (pinned by
    pytest); the metrics rows sum to the batch totals.

    Exactly-once: every output family writes ``batch=<id>`` directories
    with overwrite — a replayed batch rewrites identical paths. Same
    state-in-storage scale design as
    :func:`start_incremental_corpus_dedup`.

    JOB BUDGET: the quality gate and dedup are computed as FLAGS in one
    plan, the yield metrics as ``observe()`` aggregates on that plan
    (map-side partials inside the corpus write's own job — no
    ``count()``/``collect()`` driver actions), so each micro-batch runs
    exactly the two output writes plus the one tiny metrics-row write.

    Layout: ``out_dir/{corpus,fingerprints,metrics}/batch=N/``.
    """
    import os

    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from ..operators.dedup import norm_text
    from ..operators.textops import quality_score

    corpus_path = os.path.join(out_dir, "corpus")
    fp_path = os.path.join(out_dir, "fingerprints")
    metrics_path = os.path.join(out_dir, "metrics")

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.cache()
        in_cols = batch_df.columns
        # quality gate as a FLAG (left join: a doc the scorer can't
        # score — e.g. token-less — fails the gate, matching the old
        # inner-join-with-filter behavior)
        q = quality_score(batch_df).select("doc_id", "quality_score")
        flagged = (
            batch_df.join(q, "doc_id", "left")
            .withColumn(
                "q_ok",
                F.coalesce(
                    F.col("quality_score") >= min_quality, F.lit(False)
                ),
            )
            .withColumn("fp", F.md5(norm_text()))
        )
        # in-batch dedup among quality survivors: min doc_id per fp
        keeper = (
            flagged.filter("q_ok")
            .groupBy("fp")
            .agg(F.min("doc_id").alias("keep_id"))
        )
        marked = flagged.join(keeper, "fp", "left").withColumn(
            "is_keeper", F.col("q_ok") & (F.col("doc_id") == F.col("keep_id"))
        )
        # history dedup as a flag (same replay-safe own-batch exclusion
        # as _dedup_against_history)
        if _has_history(fp_path):
            seen = (
                spark.read.parquet(fp_path)
                .filter(F.col("batch") != batch_id)
                .select("fp")
                .distinct()
                .withColumn("in_history", F.lit(True))
            )
            marked = marked.join(seen, "fp", "left")
        else:
            marked = marked.withColumn("in_history", F.lit(None).cast("boolean"))
        marked = marked.withColumn(
            "is_fresh",
            F.col("is_keeper") & ~F.coalesce("in_history", F.lit(False)),
        ).withColumn("ws", F.size(dtokens("text")).cast("long"))
        obs = Observation(f"corpus_prep_{batch_id}")
        observed = marked.observe(
            obs,
            F.count(F.lit(1)).alias("docs_in"),
            F.sum(F.col("q_ok").cast("long")).alias("docs_quality"),
            F.sum(F.col("is_fresh").cast("long")).alias("docs_new_unique"),
            F.sum(F.when(F.col("is_fresh"), F.col("ws"))).alias("ws_tokens"),
        )
        fresh = observed.filter("is_fresh").select(*in_cols, "fp").cache()
        try:
            # job 1: corpus write — executes the whole plan, fires the
            # observe aggregates, populates both caches
            fresh.drop("fp").write.mode("overwrite").parquet(
                os.path.join(corpus_path, f"batch={batch_id}")
            )
            # job 2: fingerprint write — reads the fresh cache
            fresh.select("fp", "doc_id").write.mode("overwrite").parquet(
                os.path.join(fp_path, f"batch={batch_id}")
            )
            m = obs.get  # already complete after job 1; no extra job
            # job 3: the one-row metrics write (observed sums over an
            # empty batch arrive as NULL)
            spark.createDataFrame(
                [(
                    batch_id,
                    int(m.get("docs_in") or 0),
                    int(m.get("docs_quality") or 0),
                    int(m.get("docs_new_unique") or 0),
                    int(m.get("ws_tokens") or 0),
                )],
                "batch_id long, docs_in long, docs_quality long, "
                "docs_new_unique long, ws_tokens long",
            ).write.mode("overwrite").parquet(
                os.path.join(metrics_path, f"batch={batch_id}")
            )
        finally:
            fresh.unpersist()
            batch_df.unpersist()

    return _start_doc_stream(
        spark, docs_dir, checkpoint_dir, sink, max_files_per_trigger
    )


# --------------------------------------------------------------------------
# Bloom-bounded incremental dedup: history membership in O(BLOOM_M) bits
# --------------------------------------------------------------------------


def start_bloom_corpus_dedup(
    spark: SparkSession,
    docs_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """:func:`start_incremental_corpus_dedup` with the history
    membership test replaced by a Bloom filter
    (``operators.frequency.bloom_build`` / ``bloom_maybe_contains``):
    the per-batch "seen before?" probe joins against the union of all
    prior batches' set-bit positions — a table bounded by ``BLOOM_M``
    rows FOREVER, however large the corpus grows — instead of
    anti-joining the full fingerprint store. The probe therefore
    broadcasts and stays map-side at any history size; this is the
    trade to take when the exact store's anti-join (even bucketed)
    dominates ingest cost.

    Semantics are one-sided: a true duplicate NEVER survives (the
    filter has no false negatives), but a novel document colliding with
    set bits is dropped — probability = the filter's false-positive
    rate, so size ``BLOOM_M`` to the corpus's lifetime key budget.

    Exactly-once: both output families are ``batch=<id>`` overwrite
    partitions, and the history read excludes the current batch's own
    partition (same replay reasoning as :func:`_dedup_against_history`).

    Layout: ``out_dir/corpus/batch=N/`` and ``out_dir/bloombits/batch=N/``.
    """
    import os

    from pyspark.sql import functions as F

    from ..operators.dedup import norm_text
    from ..operators.frequency import bloom_build, bloom_maybe_contains

    corpus_path = os.path.join(out_dir, "corpus")
    bits_path = os.path.join(out_dir, "bloombits")

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        hashed = batch_df.withColumn("fp", F.md5(norm_text()))
        keeper = hashed.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
        batch_unique = hashed.join(keeper, ["fp", "doc_id"], "left_semi")
        if _has_history(bits_path):
            bits = (
                spark.read.parquet(bits_path)
                .filter(F.col("batch") != batch_id)
                .select("pos")
                .distinct()
            )
            verdicts = bloom_maybe_contains(
                batch_unique.select("doc_id", "fp"), bits, "fp"
            )
            fresh = batch_unique.join(
                verdicts.filter(F.col("maybe") == 0).select("doc_id"),
                "doc_id",
                "left_semi",
            )
        else:
            fresh = batch_unique
        fresh = fresh.localCheckpoint(eager=True)
        fresh.drop("fp").write.mode("overwrite").parquet(
            os.path.join(corpus_path, f"batch={batch_id}")
        )
        bloom_build(fresh, "fp").write.mode("overwrite").parquet(
            os.path.join(bits_path, f"batch={batch_id}")
        )

    return _start_doc_stream(
        spark, docs_dir, checkpoint_dir, sink, max_files_per_trigger
    )


# --------------------------------------------------------------------------
# Incremental PARAGRAPH-level dedup: boilerplate scrub on the ingest path
# --------------------------------------------------------------------------


def start_paragraph_dedup_stream(
    spark: SparkSession,
    docs_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """Continuously scrub duplicated paragraphs from a document stream —
    the streaming twin of ``llmops.scrub_duplicate_paragraphs`` (VERDICT
    r11 task 8): boilerplate (nav text, footers, subscribe prompts)
    arrives continuously in a real crawl, and the batch operator would
    re-scan the whole corpus to catch a footer first seen months ago.
    Per micro-batch: split documents at the paragraph grain, elect the
    in-batch first occurrence per paragraph hash (min (doc_id, idx) —
    the batch operator's exact rule), drop every paragraph whose hash
    already lives in the persistent fingerprint store, and append each
    document re-assembled from its surviving paragraphs.

    Feeding batches in doc_id order yields BIT-IDENTICAL output to the
    batch scrub over the union (tested) — backfill and live ingest
    agree, the same contract the message-dedup pair above keeps.

    Scale shape: the store holds 32-byte paragraph hashes ONLY (never
    paragraph text), the history probe is a hash-keyed anti-join over
    winners (one row per DISTINCT new paragraph, not per occurrence),
    and paragraph bytes ride only the two unavoidable shuffles the batch
    operator documents. Replay safety and exactly-once follow
    :func:`_dedup_against_history`: ``batch=<id>`` overwrite partitions,
    history read excludes the replaying batch's own partition.

    Layout: ``out_dir/corpus/batch=N/`` (doc_id, text, n_paras, n_kept)
    and ``out_dir/para_fps/batch=N/`` (h).
    """
    import os

    from pyspark.sql import functions as F

    from ..operators.llmops import split_paragraphs

    corpus_path = os.path.join(out_dir, "corpus")
    fp_path = os.path.join(out_dir, "para_fps")

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        paras = split_paragraphs(batch_df.select("doc_id", "text"))
        winners = (
            paras.select("doc_id", "idx", "h")
            .groupBy("h")
            .agg(F.min(F.struct("doc_id", "idx")).alias("w"))
        )
        if _has_history(fp_path):
            seen = (
                spark.read.parquet(fp_path)
                .filter(F.col("batch") != batch_id)
                .select("h")
            )
            winners = winners.join(seen, "h", "left_anti")
        winners = winners.localCheckpoint(eager=True)
        # keep = in-batch first occurrence of a hash never seen before:
        # a historical dup lost its winners row to the anti-join (w is
        # NULL after the left join), an in-batch dup loses the
        # (doc_id, idx) tiebreak
        flagged = paras.join(winners, "h", "left").select(
            "doc_id",
            "idx",
            "para",
            (
                F.col("w").isNotNull()
                & (F.col("w.doc_id") == F.col("doc_id"))
                & (F.col("w.idx") == F.col("idx"))
            ).alias("keep"),
        )
        out = flagged.groupBy("doc_id").agg(
            F.coalesce(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.when(
                                    F.col("keep"),
                                    F.struct("idx", "para"),
                                )
                            )
                        ),
                        lambda s: s["para"],
                    ),
                    "\n",
                ),
                F.lit(""),
            ).alias("text"),
            F.count(F.lit(1)).alias("n_paras"),
            F.sum(F.col("keep").cast("long")).alias("n_kept"),
        ).select("doc_id", "text", "n_paras", "n_kept")
        out.write.mode("overwrite").parquet(
            os.path.join(corpus_path, f"batch={batch_id}")
        )
        winners.select("h").write.mode("overwrite").parquet(
            os.path.join(fp_path, f"batch={batch_id}")
        )

    return _start_doc_stream(
        spark, docs_dir, checkpoint_dir, sink, max_files_per_trigger
    )


def minhash_slot_candidates(
    probe: DataFrame,
    reference: DataFrame,
    block_cap: int | None = None,
) -> DataFrame:
    """Per-slot candidate join for the streaming minhash dedup: probe
    signatures against reference signatures on ``(seed, minhash)``. One
    output row per agreeing slot; the downstream groupBy counts rows per
    (probe doc, reference doc) pair to apply ``min_agree``.

    BLOCK-OCCUPANCY BOUND (``block_cap``; None — the DEFAULT — is the
    exact join, matching the batch-path contract): within each
    ``(seed, minhash)`` slot bucket only the ``block_cap``
    lowest-``doc_id`` reference members (the bucket's pivots) are
    eligible, so a mass-duplicate batch — where every copy shares every
    slot value and the join would otherwise emit ~R^2 rows per clique —
    emits at most ``block_cap * R`` rows per slot. Same pivot bound as
    the batch-path generators (operators/dedup.py::
    simhash_pairs_from_signatures, similarity.py::knn_graph).

    RECALL CAVEAT (why the cap is opt-in, not the default): pivots are
    per-SLOT, so a true near-dup pair can escape when UNRELATED
    lower-id docs crowd the pair's agreeing slots (each slot bucket's
    32 pivots are all strangers sharing only that one minhash value —
    the duplicate's earlier copy is never an eligible reference, and
    the later copy agrees with no single pivot on >= min_agree slots).
    A clique of TRUE duplicates is safe (its lowest ids share every
    slot and rank first in each), but cross-doc crowding on skewed
    shingle distributions is exactly where the cap can leak — turn it
    on for mass-duplicate ingest bursts, knowing the trade.

    ``probe`` columns: doc_id, seed, minhash.
    ``reference`` columns: ref_id, seed, minhash.
    -> doc_id, ref_id (one row per agreeing slot)
    """
    from pyspark.sql import Window

    from pyspark.sql import functions as F

    ref = reference
    if block_cap is not None:
        pw = Window.partitionBy("seed", "minhash").orderBy("ref_id")
        ref = (
            ref.withColumn("prank", F.row_number().over(pw))
            .filter(F.col("prank") <= block_cap)
            .drop("prank")
        )
    return probe.join(ref, ["seed", "minhash"]).select("doc_id", "ref_id")


def start_minhash_corpus_dedup(
    spark: SparkSession,
    docs_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    num_hashes: int = 8,
    shingle_k: int = 3,
    min_agree: int = 6,
    max_files_per_trigger: int | None = None,
    block_cap: int | None = None,
) -> StreamingQuery:
    """Incremental NEAR-duplicate corpus ingest: the MinHash analog of
    :func:`start_incremental_corpus_dedup`. The persistent store holds
    SIGNATURES (doc_id, seed, minhash — ``num_hashes`` rows per doc),
    never text: an incoming doc is dropped when its signature agrees
    with any stored (or smaller-id in-batch) doc's signature on at
    least ``min_agree`` of ``num_hashes`` slots — the standard MinHash
    Jaccard estimate (6/8 ≈ 0.75), so history verification needs no
    historical text at all. A doc is dropped if it matches ANY
    smaller/earlier doc, matched or not itself ("keep first copy", the
    corpus-ingest contract).

    Scale: the probe is an equi-join on ``(seed, minhash)`` — uniform
    hash keys, no skew; the store carries ``num_hashes`` 8-hex values
    per surviving doc (tiny vs text) and at 100 TB is bucketed on
    ``minhash`` so the probe co-locates. Agreement counting is a
    groupBy on the candidate pairs, whose size is band-bounded — and,
    when ``block_cap`` is set, adversarially bounded (see
    :func:`minhash_slot_candidates`): a mass-duplicate batch or a
    boilerplate-heavy history slot then emits at most ``block_cap *
    occupancy`` candidate rows per slot instead of ~occupancy^2. The
    default is the EXACT join (the drop-first-copy contract holds
    unconditionally); opt into the cap for adversarial ingest bursts,
    accepting the per-slot pivot recall caveat documented there.

    Exactly-once: ``batch=<id>`` overwrite partitions for both corpus
    and signatures; the history read excludes the current batch's own
    partition (same replay reasoning as :func:`_dedup_against_history`).

    Layout: ``out_dir/corpus/batch=N/`` and ``out_dir/signatures/batch=N/``.
    """
    import os

    from pyspark.sql import functions as F

    from ..operators.dedup import minhash_signatures

    corpus_path = os.path.join(out_dir, "corpus")
    sig_path = os.path.join(out_dir, "signatures")

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        sigs = minhash_signatures(
            batch_df, num_hashes, shingle_k
        ).localCheckpoint(eager=True)
        # in-batch: drop any doc agreeing with a smaller (pivot) doc_id
        in_batch = (
            minhash_slot_candidates(
                sigs,
                sigs.select(F.col("doc_id").alias("ref_id"), "seed", "minhash"),
                block_cap,
            )
            .filter(F.col("ref_id") < F.col("doc_id"))
            .groupBy("ref_id", "doc_id")
            .count()
            .filter(F.col("count") >= min_agree)
            .select("doc_id")
            .distinct()
        )
        drops = in_batch
        if _has_history(sig_path):
            hist = (
                spark.read.parquet(sig_path)
                .filter(F.col("batch") != batch_id)
                .select(
                    F.col("doc_id").alias("ref_id"), "seed", "minhash"
                )
            )
            vs_hist = (
                minhash_slot_candidates(sigs, hist, block_cap)
                .groupBy("doc_id", "ref_id")
                .count()
                .filter(F.col("count") >= min_agree)
                .select("doc_id")
                .distinct()
            )
            drops = drops.union(vs_hist).distinct()
        survivors = batch_df.join(drops, "doc_id", "left_anti")
        survivors = survivors.localCheckpoint(eager=True)
        survivors.write.mode("overwrite").parquet(
            os.path.join(corpus_path, f"batch={batch_id}")
        )
        sigs.join(
            survivors.select("doc_id"), "doc_id", "left_semi"
        ).write.mode("overwrite").parquet(
            os.path.join(sig_path, f"batch={batch_id}")
        )

    return _start_doc_stream(
        spark, docs_dir, checkpoint_dir, sink, max_files_per_trigger
    )


def start_phash_media_dedup(
    spark: SparkSession,
    media_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    max_hamming: int = 7,
    fake: bool = False,
    glob: str | None = None,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """Incremental NEAR-duplicate MEDIA ingest: the multimodal analog of
    :func:`start_minhash_corpus_dedup`. Each micro-batch of binary
    media files is perceptually fingerprinted — DCT pHash over real
    decoded pixels (multimodal.image_phash, GIF first frames included)
    for visual items, the time-x-mel-band hash (multimodal.audio_phash)
    for audio — and an item is dropped when its hash lies within
    ``max_hamming`` bits of any stored (or smaller-id in-batch) item's
    hash OF THE SAME MODALITY (the modality is part of the match key,
    so the two 64-bit spaces never cross-match). The persistent store holds 8-byte HASHES, never payloads —
    history verification at 100 TB costs one banded equi-join on block
    values (exact by pigeonhole, multimodal.phash_probe_candidates),
    and payload bytes never enter a shuffle (fingerprints are extracted
    map-side, survivors are written straight back out).

    Exactly-once: ``batch=<id>`` overwrite partitions for both the
    surviving media and their hashes; the history read excludes the
    current batch's own partition (same replay reasoning as
    :func:`_dedup_against_history`).

    Layout: ``out_dir/media/batch=N/`` and ``out_dir/phashes/batch=N/``.
    """
    import os

    from pyspark.sql import functions as F

    from ..operators.multimodal import (
        audio_phash,
        image_phash,
        phash_probe_candidates,
    )
    from ..sources.files import read_binary_media_stream

    media_path = os.path.join(out_dir, "media")
    hash_path = os.path.join(out_dir, "phashes")

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        # visual items (images + GIF first frames) and audio items are
        # fingerprinted by their own extractors; `modality` rides along
        # as a join key so the two 64-bit spaces can never cross-match
        # skip_undecodable: the stream must survive formats the real
        # decoders don't cover (an mp4 in the media dir previously
        # killed the query via image_phash's codec gate — review r9);
        # undecodable items go unfingerprinted, i.e. conservatively
        # kept, and fake mode still exercises every format's plumbing
        visual = image_phash(
            batch_df,
            fake=fake,
            kinds=("image", "video"),
            skip_undecodable=not fake,
        ).select("media_id", "phash", F.lit("visual").alias("modality"))
        audio = audio_phash(
            batch_df, fake=fake, skip_undecodable=not fake
        ).select("media_id", "phash", F.lit("audio").alias("modality"))
        hashes = visual.unionByName(audio).localCheckpoint(eager=True)
        in_batch = (
            phash_probe_candidates(
                hashes,
                hashes.select(
                    F.col("media_id").alias("ref_id"), "phash", "modality"
                ),
                max_hamming,
                key_cols=["modality"],
            )
            .filter(F.col("ref_id") < F.col("media_id"))
            .select("media_id")
            .distinct()
        )
        drops = in_batch
        if _has_history(hash_path):
            hist = (
                spark.read.parquet(hash_path)
                .filter(F.col("batch") != batch_id)
                .select(
                    F.col("media_id").alias("ref_id"), "phash", "modality"
                )
            )
            vs_hist = (
                phash_probe_candidates(
                    hashes, hist, max_hamming, key_cols=["modality"]
                )
                .select("media_id")
                .distinct()
            )
            drops = drops.union(vs_hist).distinct()
        survivors = batch_df.join(drops, "media_id", "left_anti")
        survivors = survivors.localCheckpoint(eager=True)
        survivors.write.mode("overwrite").parquet(
            os.path.join(media_path, f"batch={batch_id}")
        )
        hashes.join(
            survivors.select("media_id"), "media_id", "left_semi"
        ).write.mode("overwrite").parquet(
            os.path.join(hash_path, f"batch={batch_id}")
        )

    stream = read_binary_media_stream(
        spark, media_dir, glob, max_files_per_trigger
    )
    return (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
