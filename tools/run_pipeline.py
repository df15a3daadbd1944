#!/usr/bin/env python
"""One-command corpus-curation demo: run the full operator chain on the
driver testdata and print a JSON summary per stage.

    python tools/run_pipeline.py [sf_dir] [out_dir]

Stages (each a plain DataFrame -> DataFrame operator from the package):
quality-rule gate -> exact-substring span rewrite -> MinHash near-dup
cluster dedup (keep-best representative) -> temperature mixture ->
globally-ordered epoch shards, with the per-source datacard printed for
the input and the surviving corpus.
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

    flags = textops.quality_rule_flags(docs)
    good = docs.join(
        flags.filter("quality_pass").select("doc_id"), "doc_id", "left_semi"
    )
    summary["after_quality_gate"] = good.count()

    rewritten = dedup.remove_duplicate_spans(good, shingle_k=5)
    tok = rewritten.agg(
        F.sum("n_tokens").alias("before"), F.sum("n_kept").alias("after")
    ).collect()[0]
    summary["span_rewrite"] = {
        "tokens_before": tok["before"],
        "tokens_after": tok["after"],
    }

    pairs = dedup.minhash_dedup_pairs(good, 8, 3, 0.5, sort=False)
    clusters = graph.dedup_clusters(good, pairs)
    deduped = good.join(
        clusters.filter(~F.col("is_survivor")).select("doc_id"),
        "doc_id",
        "left_anti",
    )
    summary["after_near_dedup"] = deduped.count()
    reps = graph.cluster_representatives(
        good, pairs, textops.quality_score(good)
    )
    summary["near_dup_clusters"] = reps.count()

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
