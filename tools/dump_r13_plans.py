"""Dump .explain("formatted") for the r13 optimization targets into
plans/r13/<query>_<tag>.txt (tag = before/after). Reuses dump_plans'
id-stabilizer so before/after diffs show structure, not counter churn.

Usage: python tools/dump_r13_plans.py <tag> [query ...]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dump_plans import stabilize  # noqa: E402  (same tools dir)

DEFAULT_TARGETS = [
    "curation_scoreboard",
    "range_incident_purchases",
    "text_bpe_encode",
    "dedup_cluster_representatives",
    "embedding_pca_projection",
    "dedup_jaccard_prefix_join",
    "text_bpe_train",
    "dedup_kcore_membership",
    "eval_minhash_exact_recall",
    "dedup_connected_clusters",
    "timeseries_fill_gaps",
    "text_nb_quality",
    "text_bigram_lm",
    "dedup_semantic_clusters",
    "retrieval_hybrid_rrf",
    "dedup_minhash_lsh",
    "bm25_retrieval",
    "eval_ivf_recall",
    "corpus_datacard",
    "channel_page_single_plan",
    "bloom_ngram_membership",
    "eval_simhash_cap_recall",
    "channel_pagerank",
    "index_page_single_plan",
    "dedup_simhash",
    "user_emote_stats_totals",
    "user_emote_stats",
    "emote_stats",
]


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    targets = sys.argv[2:] or DEFAULT_TARGETS
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from twitch_chat_analyser_spark import registry
    from twitch_chat_analyser_spark.session import get_spark

    spark = get_spark("r13-plans")
    qs = registry.queries()
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r13",
    )
    os.makedirs(outdir, exist_ok=True)
    for name in targets:
        df = qs[name](spark, sf_dir)
        plan = stabilize(
            df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode
                .fromString("formatted")
            )
        )
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan.strip() + "\n")
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
