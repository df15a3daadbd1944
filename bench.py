"""Headline-query benchmark. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Runs at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS]. Each query is timed to full materialization
(count of the result) after a warm-up of the input scans.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    from twitch_chat_analyser_spark import registry
    from twitch_chat_analyser_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = -1.0

    spark = get_spark("bench")

    # Headline set: the five reference fact tables + representative
    # read-path and LLM-pipeline operators (grows as phases land).
    all_queries = registry.queries()
    headline = [
        "channel_stats",
        "user_stats",
        "emote_stats",
        "user_emote_stats",
        "phrase_stats",
        "messages_matching_phrase",
        "channel_stats_totals",
        "user_emote_stats_totals",
    ]
    extra = [n for n in all_queries if n not in headline]
    names = headline + extra

    # Warm-up: file listing, parquet footers, JVM/codegen paths — so
    # per-query timings measure the queries, not session cold start.
    from twitch_chat_analyser_spark import ingest

    for t in ingest.TABLES:
        ingest.load(spark, sf_dir, t).count()
    all_queries["channel_stats"](spark, sf_dir).count()

    # JIT warm-up on tiny slices (measured: the first query to exercise
    # each path pays 5-25s of one-time C2/codegen compilation that then
    # never recurs — e.g. the higher-order-function dot-product fold went
    # 28.7s cold -> 2.0s warm at sf0.1). Warm the three hot machinery
    # paths once so timings measure the operators: (a) the HOF fold +
    # nested-loop pair join, (b) the Python/Arrow worker pool, (c) window
    # functions over a shuffle.
    from pyspark.sql import functions as F

    from twitch_chat_analyser_spark.operators import similarity as _sim

    _emb_small = ingest.load(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < 256
    )
    _sim.embedding_dedup_pairs(_emb_small).count()  # (a)
    _sim.ann_topk_blas(_emb_small, query_ids=[0], k=1).count()  # (b)
    _msg_small = ingest.messages(spark, sf_dir).limit(4096)
    from pyspark.sql.window import Window as _W

    _msg_small.withColumn(
        "rn", F.row_number().over(_W.partitionBy("channel").orderBy("timestamp"))
    ).count()  # (c)

    # Best-of-2 per query: a single pass in a long-lived session folds
    # one-time JIT/GC events into whichever query they land on (measured:
    # a query at 1.2s steady-state recorded 15s when a C2 compile hit it).
    # The min of two runs is the steady-state cost of the PLAN — the
    # number that scales — not the session's allocation noise.
    timings: dict[str, float] = {}
    for name in names:
        fn = all_queries[name]
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            df = fn(spark, sf_dir)
            df.count()  # materialize fully without driver collect
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)

    # Streaming write-path throughput: all five fact pipelines (the
    # reference's unit of work — one message through five aggregation
    # dataflows + upsert sinks) over the staged message stream,
    # end-to-end including sink merges. Extra keys; the driver's
    # headline metric stays the batch total.
    streaming = _bench_streaming(spark, sf_dir)

    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "timing": "min_of_2_runs",
                "sf": sf,
                **streaming,
            }
        )
    )


def _bench_streaming(spark, sf_dir: str) -> dict:
    import shutil
    import tempfile

    from twitch_chat_analyser_spark import ingest
    from twitch_chat_analyser_spark.streaming import pipeline as sp

    tmp = tempfile.mkdtemp(prefix="bench-stream-")
    try:
        src = os.path.join(tmp, "src")
        out = os.path.join(tmp, "out")
        ckpt = os.path.join(tmp, "ckpt")
        msgs = ingest.messages(spark, sf_dir).select(
            "ts", "channel", "username", "message"
        )
        n = msgs.count()
        msgs.write.parquet(src)
        t0 = time.time()
        sp.run_all(spark, src, out, ckpt)
        wall = time.time() - t0
        # same workload through the one-scan-per-trigger topology
        out1 = os.path.join(tmp, "out1")
        ckpt1 = os.path.join(tmp, "ckpt1")
        t0 = time.time()
        sp.run_all_single_pass(spark, src, out1, ckpt1)
        wall1 = time.time() - t0
        return {
            "streaming_messages": n,
            "streaming_wall_sec": round(wall, 3),
            "streaming_msgs_per_sec": round(n / wall, 1),
            "streaming_single_pass_wall_sec": round(wall1, 3),
            "streaming_single_pass_msgs_per_sec": round(n / wall1, 1),
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
