"""Isolated per-query timing for optimization evidence (r13).

Runs the named registry queries in ONE fresh session on an idle box —
same warm-up discipline as bench.py (table scans + JIT paths), then per
query: one discarded warm run followed by N timed runs to the noop sink
(guide 1.4), reporting the median. This is the protocol that survives
this sandbox's noise floor where bench.py's min-of-2 cannot (r12: a
loaded box produced phantom 2-5x per-query regressions).

Usage: python tools/isotime.py [--runs N] [--out file.json] query [query ...]
       python tools/isotime.py --top K          # K slowest per BENCH_FULL
"""
from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--out", default=None)
    ap.add_argument("--top", type=int, default=0,
                    help="time the K slowest queries per BENCH_FULL.json")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = list(args.queries)
    if args.top:
        bf = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "BENCH_FULL.json")
        q = json.load(open(bf))["queries"]
        names += [n for n, _ in sorted(q.items(), key=lambda kv: -kv[1])
                  [:args.top] if n not in names]
    if not names:
        ap.error("no queries given")

    from twitch_chat_analyser_spark import ingest, registry
    from twitch_chat_analyser_spark.session import get_spark

    spark = get_spark("isotime")
    qs = registry.queries()
    unknown = [n for n in names if n not in qs]
    if unknown:
        ap.error(f"unknown queries: {unknown}")

    # bench.py's warm-up: scans + the three one-time JIT paths
    for t in ingest.TABLES:
        ingest.load(spark, sf_dir, t).count()
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as _W

    from twitch_chat_analyser_spark.operators import llmops as _llm
    from twitch_chat_analyser_spark.operators import similarity as _sim

    _emb_small = ingest.load(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < 256)
    _sim.embedding_dedup_pairs(_emb_small).count()
    _sim.ann_topk_blas(_emb_small, query_ids=[0], k=1).count()
    ingest.messages(spark, sf_dir).limit(4096).withColumn(
        "rn", F.row_number().over(_W.partitionBy("channel").orderBy("timestamp"))
    ).count()
    if any(n == "text_phrase_search_indexed" for n in names):
        _llm.ensure_phrase_postings(spark, sf_dir, force=True)

    def run_once(fn) -> float:
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 3)

    results: dict[str, dict] = {}
    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"isotime:{name}")
        warm = run_once(fn)
        runs = [run_once(fn) for _ in range(args.runs)]
        results[name] = {
            "warm": warm,
            "runs": runs,
            "median": round(statistics.median(runs), 3),
        }
        print(f"{results[name]['median']:8.3f}s  {name}  "
              f"(warm {warm}, runs {runs})", flush=True)

    payload = {
        "sf_dir": sf_dir,
        "loadavg": [round(x, 2) for x in os.getloadavg()],
        "results": results,
    }
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(payload, fh, indent=1)
    print(json.dumps({n: r["median"] for n, r in results.items()}))


if __name__ == "__main__":
    main()
