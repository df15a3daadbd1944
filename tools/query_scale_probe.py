"""Measure the sec-vs-rows slope of the most expensive headline
queries across scale factors (VERDICT r8 #5).

The 2x bench gate is flat at one scale factor; a measured slope is the
evidence the 100 TB claims rest on. This runs the given registry
queries (default: the dedup family + curation_scoreboard — the top-5
most expensive in BENCH_FULL) at sf0.01 and sf0.1, records min-of-N
noop-sink wall time and the input table row counts, and prints a
markdown table with the time ratio vs the row ratio. Time ratio at or
below the row ratio = no superlinear term appeared across the step.

Usage: python tools/query_scale_probe.py [q1,q2,...] [runs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_QUERIES = [
    "dedup_cluster_representatives",
    "dedup_connected_clusters",
    "curation_scoreboard",
    "dedup_jaccard_prefix_join",
    "dedup_kcore_membership",
]
SF_DIRS = ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
# the input table whose cardinality drives each query's cost
DRIVING_TABLE = {
    "dedup_cluster_representatives": "documents",
    "dedup_connected_clusters": "documents",
    "curation_scoreboard": "documents",
    "dedup_jaccard_prefix_join": "documents",
    "dedup_kcore_membership": "documents",
}


def main() -> None:
    import __spark_entry__ as entrymod

    from twitch_chat_analyser_spark import ingest
    from twitch_chat_analyser_spark.session import get_spark

    names = (
        sys.argv[1].split(",") if len(sys.argv) > 1 else DEFAULT_QUERIES
    )
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("query-scale-probe")
    queries = entrymod.queries()

    counts: dict[str, dict[str, int]] = {}
    times: dict[str, dict[str, float]] = {n: {} for n in names}
    for sf_dir in SF_DIRS:
        counts[sf_dir] = {}
        for name in names:
            tbl = DRIVING_TABLE.get(name, "documents")
            if tbl not in counts[sf_dir]:
                counts[sf_dir][tbl] = ingest.load(spark, sf_dir, tbl).count()
            fn = queries[name]
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = float("inf")
            for _ in range(runs):
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.perf_counter() - t0)
            times[name][sf_dir] = best
            print(f"{name} @ {sf_dir}: {best:.2f}s")

    lo, hi = SF_DIRS
    print()
    print("| query | driving rows sf0.01 -> sf0.1 | sf0.01 | sf0.1 "
          "| time ratio | row ratio |")
    print("|---|---|---|---|---|---|")
    for name in names:
        tbl = DRIVING_TABLE.get(name, "documents")
        r_lo, r_hi = counts[lo][tbl], counts[hi][tbl]
        t_lo, t_hi = times[name][lo], times[name][hi]
        print(
            f"| {name} | {r_lo:,} -> {r_hi:,} | {t_lo:.2f} s | "
            f"{t_hi:.2f} s | {t_hi / t_lo:.2f}x | {r_hi / r_lo:.1f}x |"
        )


if __name__ == "__main__":
    main()
