#!/usr/bin/env python
"""One-command corpus-curation demo: run the full operator chain on the
driver testdata and print a JSON summary per stage.

    python tools/run_pipeline.py [sf_dir] [out_dir]

Stages (each a plain DataFrame -> DataFrame operator from the package):
three-filter quality gate (Gopher rules AND NB classifier AND bigram-LM
perplexity — the curation scoreboard's conjunctive keep) ->
exact-substring span rewrite -> MinHash near-dup cluster dedup
(keep-best representative) -> temperature mixture -> globally-ordered
epoch shards, with the per-source datacard printed for the input and
the surviving corpus.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(
        prefix="corpus_shards_"
    )

    from pyspark.sql import functions as F

    from twitch_chat_analyser_spark import ingest, storage
    from twitch_chat_analyser_spark.operators import (
        dedup,
        graph,
        llmops,
        sampling,
        textops,
    )
    from twitch_chat_analyser_spark.session import get_spark

    spark = get_spark("corpus-pipeline")
    docs = ingest.load(spark, sf_dir, "documents")
    summary: dict = {"sf_dir": sf_dir, "out_dir": out_dir}
    summary["input_docs"] = docs.count()
    summary["input_datacard"] = [
        r.asDict() for r in llmops.corpus_datacard(docs).collect()
    ]

    # three-filter gate: rules (hard heuristics) + NB classifier + the
    # bigram-LM perplexity cut, each trained on the corpus' own
    # rules-passing subset (ONE shared rules computation)
    labels = (
        textops.quality_rule_flags(docs)
        .select("doc_id", "quality_pass")
        .localCheckpoint(eager=False)
    )
    nb = textops.nb_quality_score(docs, labels=labels)
    lm = textops.bigram_lm_surprise(docs, labels=labels)
    keep = (
        labels.filter("quality_pass")
        .join(nb.filter("nb_pass").select("doc_id"), "doc_id", "left_semi")
        .join(lm.filter("lm_pass").select("doc_id"), "doc_id", "left_semi")
        .select("doc_id")
    )
    good = docs.join(keep, "doc_id", "left_semi")
    summary["gate_filters"] = {
        "rules_pass": labels.filter("quality_pass").count(),
        "nb_pass": nb.filter("nb_pass").count(),
        "lm_pass": lm.filter("lm_pass").count(),
    }
    summary["after_quality_gate"] = good.count()

    # the rewrite's output IS the downstream corpus: text becomes the
    # span-deduplicated text, n_chars re-derived from it
    rewritten = dedup.remove_duplicate_spans(good, shingle_k=5)
    tok = rewritten.agg(
        F.sum("n_tokens").alias("before"), F.sum("n_kept").alias("after")
    ).collect()[0]
    summary["span_rewrite"] = {
        "tokens_before": tok["before"],
        "tokens_after": tok["after"],
    }
    # a doc whose every span duplicated earlier content rewrites to the
    # empty string — nothing left to train on, drop it here
    summary["fully_collapsed_docs"] = rewritten.filter(
        "n_kept = 0"
    ).count()
    corpus = (
        good.select("doc_id", "lang", "source")
        .join(
            rewritten.filter("n_kept > 0").select("doc_id", "text_dedup"),
            "doc_id",
        )
        .select(
            "doc_id",
            F.col("text_dedup").alias("text"),
            "lang",
            "source",
            F.length("text_dedup").cast("long").alias("n_chars"),
        )
        .localCheckpoint(eager=False)
    )

    # near-dup clusters on the rewritten corpus; KEEP-BEST policy: the
    # quality-argmax representative of each cluster survives, every
    # other member is dropped (singletons pass through untouched). The
    # fixpoint runs once and is shared with the representative argmax.
    pairs = dedup.minhash_dedup_pairs(corpus, 8, 3, 0.5, sort=False)
    clusters = graph.dedup_clusters(corpus, pairs)
    reps = graph.cluster_representatives(
        corpus, pairs, textops.quality_score(corpus), clusters=clusters
    )
    summary["near_dup_clusters"] = reps.count()
    cluster_members = clusters.join(
        reps.select("cluster_id"), "cluster_id", "left_semi"
    ).select("doc_id")
    deduped = corpus.join(cluster_members, "doc_id", "left_anti").unionByName(
        corpus.join(
            reps.select(F.col("rep_doc_id").alias("doc_id")),
            "doc_id",
            "left_semi",
        )
    )
    summary["after_near_dedup"] = deduped.count()

    mixed = sampling.mixture_temperature(deduped, tau=0.5, budget_fraction=0.8)
    final = deduped.join(mixed.select("doc_id"), "doc_id", "left_semi")
    summary["after_mixture"] = final.count()

    storage.write_training_shards(final, out_dir, epoch=0, shards=4)
    back = spark.read.parquet(out_dir)
    summary["shard_rows"] = back.count()
    summary["output_datacard"] = [
        r.asDict()
        for r in llmops.corpus_datacard(
            final.select("doc_id", "text", "lang", "source", "n_chars")
        ).collect()
    ]
    print(json.dumps(summary, default=str))


if __name__ == "__main__":
    main()
