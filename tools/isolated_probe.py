"""Isolated per-query timing: one fresh JVM/session per query, noop
sink, one untimed warm-up run (codegen/JIT) then ``runs`` timed runs;
reports min/median/max per query.

This is the round-13 optimization-evidence protocol (guide §1.4): the
shared-session bench (bench.py) folds session-level JIT and GC into
whichever query hits a path first and is the artifact the driver
compares round-over-round; THIS tool is for before/after A/B of a
single query where cross-query contamination must be zero.

Usage: python tools/isolated_probe.py q1,q2,... [runs=3]
Emits one JSON line per query on stdout (prefix ISOPROBE) and a sorted
summary at the end.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def child(name: str, runs: int) -> None:
    from twitch_chat_analyser_spark import ingest, registry
    from twitch_chat_analyser_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(f"iso-{name}")
    fn = registry.queries()[name]
    for t in ingest.TABLES:
        ingest.load(spark, sf_dir, t).count()
    if name == "text_phrase_search_indexed":
        from twitch_chat_analyser_spark.operators import llmops

        llmops.ensure_phrase_postings(spark, sf_dir, force=True)

    def once() -> float:
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 3)

    warm = once()
    times = sorted(once() for _ in range(runs))
    # true median: odd -> middle element, even -> mean of the two
    # middle elements (the old times[runs//2 - 1] reported the MIN for
    # runs=2 while labeling it median — ADVICE r13)
    med = (
        times[runs // 2]
        if runs % 2
        else round((times[runs // 2 - 1] + times[runs // 2]) / 2, 3)
    )
    print(
        "ISOPROBE "
        + json.dumps(
            {
                "query": name,
                "warm": warm,
                "runs": times,
                "median": med,
                "min": times[0],
            }
        ),
        flush=True,
    )


def main() -> None:
    if os.environ.get("ISOPROBE_CHILD"):
        child(os.environ["ISOPROBE_CHILD"], int(sys.argv[1]))
        return
    names = sys.argv[1].split(",")
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    results = []
    for name in names:
        env = dict(os.environ, ISOPROBE_CHILD=name)
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), str(runs)],
            env=env,
            capture_output=True,
            text=True,
        )
        line = next(
            (l for l in p.stdout.splitlines() if l.startswith("ISOPROBE ")),
            None,
        )
        if line is None:
            print(f"FAIL {name}: rc={p.returncode}\n{p.stderr[-2000:]}")
            continue
        rec = json.loads(line[len("ISOPROBE "):])
        results.append(rec)
        print(f"{rec['median']:8.2f}  {name}  runs={rec['runs']}", flush=True)
    print("\n== sorted by median ==")
    for rec in sorted(results, key=lambda r: -r["median"]):
        print(f"{rec['median']:8.2f}  {rec['query']}")


if __name__ == "__main__":
    main()
