"""Headline-query benchmark. Prints ONE COMPACT JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

The stdout line stays small (headline queries + slowest tail + streaming
summary) so harnesses with bounded capture buffers always parse it; the
FULL per-query timing map and streaming percentiles land in
``BENCH_FULL.json`` next to this script.

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

# stdout `queries` map: the reference's five fact tables + totals +
# side output — the workload BASELINE.md defines; everything else is in
# BENCH_FULL.json.
HEADLINE = [
    "channel_stats",
    "user_stats",
    "emote_stats",
    "user_emote_stats",
    "phrase_stats",
    "messages_matching_phrase",
    "channel_stats_totals",
    "user_emote_stats_totals",
]


def main() -> None:
    from twitch_chat_analyser_spark import registry
    from twitch_chat_analyser_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = -1.0

    spark = get_spark("bench")

    all_queries = registry.queries()
    extra = [n for n in all_queries if n not in HEADLINE]
    names = HEADLINE + extra

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
    # band joins, (b) the Python/Arrow worker pool, (c) window
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

    # One-time index builds, measured separately: the indexed phrase
    # search answers from a prebuilt postings table, and min-of-N would
    # otherwise report only the warm probe — the build cost (the entire
    # amortization argument for the postings layout) must be visible.
    from twitch_chat_analyser_spark.operators import llmops as _llm

    t0 = time.time()
    _llm.ensure_phrase_postings(spark, sf_dir, force=True)
    index_build = {"phrase_postings_sec": round(time.time() - t0, 3)}

    # Ground-truth construction for the recall evals, hoisted OUT of the
    # timed region (VERDICT r13 item 6): the truth memos
    # (llmops._IVF_TRUTH_ROWS / _JACCARD_TRUTH_ROWS) previously filled
    # on the first timed run, so min-of-2 reported the memo-warm second
    # run. Build them here and report the cost like phrase_postings_sec;
    # with truth warm, eval_* run-1 ~= run-2 and the
    # eval_queries_excluded_from_regression carve-out is dropped.
    t0 = time.time()
    _llm._ivf_truth(spark, sf_dir)
    index_build["ivf_truth_sec"] = round(time.time() - t0, 3)
    t0 = time.time()
    _llm._jaccard_truth(spark, sf_dir)
    index_build["jaccard_truth_sec"] = round(time.time() - t0, 3)

    # Per-query timing protocol (r13, VERDICT r12 item 1 — the r11
    # contingency triggered: driver and builder disagreed >1.5x on
    # identical code and min-of-2 could not rebut load). Two runs per
    # query as before — a single pass folds one-time JIT/GC events into
    # whichever query they land on — but a 2-run spread above
    # SPREAD_SUSPECT escalates to a THIRD run and the reported time is
    # the median of 3 (one contaminated run can no longer set the
    # number; two contaminated runs are flagged, see below). All runs
    # land in BENCH_FULL.queries_runs, the legacy min-of-2 in
    # queries_min2 (round-over-round comparability), and queries whose
    # FINAL spread still exceeds SPREAD_SUSPECT are named in
    # measurement_suspect so a polluted total is self-identifying
    # instead of reading as a code regression (r12: 207 s driver vs
    # 152 s builder+judge on identical code).
    SPREAD_SUSPECT = 1.5
    load_start = os.getloadavg()

    def run_once(fn) -> float:
        t0 = time.time()
        df = fn(spark, sf_dir)
        # noop sink: evaluates EVERY projection column (count()
        # would let Catalyst prune unevaluated expressions, under-
        # measuring map-only transforms like text_pii_redaction)
        # while still never collecting to the driver
        df.write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 3)

    timings: dict[str, float] = {}
    min2: dict[str, float] = {}
    query_runs: dict[str, list[float]] = {}
    for name in names:
        fn = all_queries[name]
        runs = [run_once(fn) for _ in range(2)]
        min2[name] = min(runs)
        if max(runs) / max(min(runs), 1e-9) > SPREAD_SUSPECT:
            runs.append(run_once(fn))
            timings[name] = sorted(runs)[1]  # median of 3
        else:
            timings[name] = min(runs)
        query_runs[name] = runs

    total = round(sum(timings.values()), 3)
    # per-query run spread (max/min): > SPREAD_SUSPECT after escalation
    # means even 3 runs disagreed — treat that query's number as
    # measurement-suspect, not as a regression signal
    # suspect membership thresholds on the UNROUNDED ratio — the
    # display rounding used to run first, so a spread of 1.5019
    # rounded to 1.50, failed `> 1.5`, and disagreed with
    # check_artifacts' unrounded recomputation (r14 drift finding)
    raw_spreads = {
        n: max(r) / max(min(r), 1e-9) for n, r in query_runs.items()
    }
    spreads = {n: round(s, 2) for n, s in raw_spreads.items()}
    noisy = {n: s for n, s in sorted(spreads.items(), key=lambda kv: -kv[1])[:10]}
    suspect = sorted(
        n for n, s in raw_spreads.items() if s > SPREAD_SUSPECT + 1e-9
    )

    # Streaming write-path throughput: all five fact pipelines (the
    # reference's unit of work — one message through five aggregation
    # dataflows + upsert sinks) over the staged message stream,
    # end-to-end including sink merges, plus per-trigger latency
    # percentiles from the queries' progress records.
    streaming = _bench_streaming(spark, sf_dir)
    # and the same topology with the REAL executor-side DB writer (the
    # reference's unit of work is message -> five aggregations -> SQL
    # upsert, XAPostgresSink.java) — SQLite stands in for the Postgres
    # wire (no server in this image; single-writer lock makes this a
    # conservative floor for a real Postgres)
    streaming_jdbc = _bench_streaming_jdbc(spark, sf_dir)

    # compact stdout payload: headline queries + the 5 slowest others,
    # full map to BENCH_FULL.json
    slowest = dict(
        sorted(
            ((n, t) for n, t in timings.items() if n not in HEADLINE),
            key=lambda kv: -kv[1],
        )[:5]
    )
    # tolerate a renamed/removed headline query: report what ran instead
    # of raising KeyError after the whole suite already executed
    missing = [n for n in HEADLINE if n not in timings]
    if missing:
        print(f"WARN: headline queries missing from registry: {missing}",
              file=sys.stderr)
    compact_queries = {n: timings[n] for n in HEADLINE if n in timings} | slowest
    line = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": compact_queries,
        "n_queries": len(timings),
        "timing": "min_of_2_runs_median_of_3_on_spread",
        "index_build": index_build,
        "sf": sf,
        **{k: v for k, v in streaming.items()
           if not isinstance(v, (dict, list))},
        **{k: v for k, v in streaming_jdbc.items()
           if not isinstance(v, (dict, list))},
    }

    # the committed artifact records the driver's scale (sf0.1); a
    # smoke run at another sf prints its JSON line but must not
    # clobber the sf0.1 record. The artifact is also keyed on the core
    # count: the driver benches BOTH local[32] and a lower count to
    # measure scaling, and an unkeyed path let the c8 sweep overwrite
    # the 32-core record (VERDICT r13 item 2) — non-default counts
    # land in BENCH_FULL_c{N}.json.
    if abs(sf - 0.1) < 1e-9:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        fname = (
            "BENCH_FULL.json" if cpus == "32" else f"BENCH_FULL_c{cpus}.json"
        )
        full_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), fname
        )
        with open(full_path, "w") as fh:
            json.dump(
                {
                    **line,
                    "queries": timings,
                    "queries_min2": min2,
                    "queries_runs": query_runs,
                    "run_spread_top10": noisy,
                    "measurement_suspect": suspect,
                    "spread_suspect_threshold": SPREAD_SUSPECT,
                    # 1/5/15-min load BEFORE the query sweep and at
                    # artifact-write time: a contaminated run names
                    # itself (r12: a loaded box produced a phantom +24%)
                    "loadavg_start": [round(x, 2) for x in load_start],
                    "loadavg_end": [round(x, 2) for x in os.getloadavg()],
                    "streaming": streaming,
                    "streaming_jdbc": streaming_jdbc,
                },
                fh,
                indent=1,
            )

    print(json.dumps(line))


def _percentiles(durations_ms: list[float]) -> dict:
    if not durations_ms:
        return {}
    s = sorted(durations_ms)

    def pct(p: float) -> float:
        i = min(len(s) - 1, int(round(p * (len(s) - 1))))
        return s[i]

    return {
        "batches": len(s),
        "p50_ms": round(pct(0.50), 1),
        "p95_ms": round(pct(0.95), 1),
        "max_ms": round(max(s), 1),
    }


def _trigger_durations_per_query(progress_lists) -> list[list[float]]:
    """Per-query triggerExecution durations (ms) out of recentProgress
    records (dicts in PySpark; objects with .json in some versions) —
    one inner list per progress list, so the warm-up exclusion can drop
    the FIRST batch of EACH query instead of one element of a flattened
    multi-query list (ADVICE r10: with several queries the flattened
    [1:] dropped a non-warm-up batch of the first query while keeping
    the other queries' warm-up batches)."""
    out: list[list[float]] = []
    for plist in progress_lists:
        durs: list[float] = []
        for p in plist or []:
            if hasattr(p, "json"):
                p = json.loads(p.json)
            dur = (p.get("durationMs") or {}).get("triggerExecution")
            # availableNow emits a final empty progress with no rows
            if dur is not None and p.get("numInputRows", 0) > 0:
                durs.append(float(dur))
        out.append(durs)
    return out


def _trigger_durations(progress_lists) -> list[float]:
    return [d for q in _trigger_durations_per_query(progress_lists) for d in q]


def _steady_durations(progress_lists) -> list[float]:
    """All-but-first trigger duration PER QUERY: the first trigger of
    each query pays one-time JVM JIT/codegen; the recurring cost is
    what the reference's 5 s flush budget is about."""
    return [
        d
        for q in _trigger_durations_per_query(progress_lists)
        for d in q[1:]
    ]


def _bench_streaming(spark, sf_dir: str) -> dict:
    """Parquet-store write-path twin, measured MIN-OF-2 (VERDICT r10:
    the twins were the bench's only single-run numbers while being its
    most box-noise-sensitive — r10's driver run measured every table's
    merge uniformly ~2x the builder's run of identical code and the
    protocol could not rebut it). Both runs' summaries land in the
    artifact; the headline fields come from the run with the lower
    steady-state trigger p50. After the best run, each table's merge is
    re-measured SERIALLY against the final store (the isolated floor),
    so the artifact itself carries the isolated-vs-contended per-merge
    table that r9/r10 asked for — a contended p50 near its isolated
    floor means the cost is the merge, not scheduler contention."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from twitch_chat_analyser_spark import ingest
    from twitch_chat_analyser_spark.streaming import pipeline as sp

    tmp = tempfile.mkdtemp(prefix="bench-stream-")
    try:
        src = os.path.join(tmp, "src")
        # 2x the corpus (second copy day-shifted so window keys differ):
        # >100k messages at sf0.1, split into 64 files so availableNow +
        # maxFilesPerTrigger=8 yields 8 micro-batches — enough samples
        # for meaningful per-trigger percentiles. Staged ONCE, shared
        # by both runs.
        base = ingest.messages(spark, sf_dir).select(
            "ts", "channel", "username", "message"
        )
        msgs = base.unionByName(
            base.withColumn("ts", F.col("ts") + F.expr("INTERVAL 1 DAY"))
        )
        n = msgs.count()
        msgs.repartition(64).write.parquet(src)
        # DEFAULT topology (run_all = single-pass: one source scan per
        # trigger feeding all five tables + side output) is the headline.
        # The five-query compatibility topology (run_all_multi_query) is
        # NOT benched: it pays 5x source scans by construction and is
        # compat-only (watermarked state bounding) — see COVERAGE.md; its
        # replay-idempotence stays pytest-covered.
        runs: list[dict] = []
        for i in range(2):
            out = os.path.join(tmp, f"out{i}")
            ckpt = os.path.join(tmp, f"ckpt{i}")
            merge_metrics: list[dict] = []
            t0 = time.time()
            prog = sp.run_all(
                spark, src, out, ckpt, max_files_per_trigger=8,
                merge_metrics=merge_metrics,
            )
            wall = time.time() - t0
            p = _percentiles(_trigger_durations(prog))
            steady = _percentiles(_steady_durations(prog))
            runs.append({
                "streaming_wall_sec": round(wall, 3),
                "streaming_msgs_per_sec": round(n / wall, 1),
                "streaming_trigger_p50_ms": p.get("p50_ms"),
                "streaming_trigger_p50_steady_ms": steady.get("p50_ms"),
                "streaming_trigger_p95_ms": p.get("p95_ms"),
                "streaming_trigger_batches_ms": p,
                "_out": out,
                "_events": merge_metrics,
            })
        best = min(
            runs,
            key=lambda r: r["streaming_trigger_p50_steady_ms"]
            or float("inf"),
        )
        isolated = _isolated_merge_floor(spark, src, best["_out"])
        contended = _summarize_merges(best["_events"])
        return {
            "streaming_messages": n,
            **{k: v for k, v in best.items() if not k.startswith("_")},
            "streaming_runs": [
                {k: v for k, v in r.items() if not k.startswith("_")}
                for r in runs
            ],
            "timing_protocol": "min_of_2_runs_by_steady_p50",
            # self-diagnosis: per-table layout decisions, merge wall
            # time, and store growth — BENCH_FULL can name the slow
            # merge instead of leaving a throughput delta unexplained
            "merge_breakdown": contended,
            "merge_isolated_vs_contended": _merge_floor_table(
                isolated, best["_events"]
            ),
            "merge_events": best["_events"],
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _isolated_merge_floor(spark, src: str, out_dir: str) -> dict:
    """Re-run ONE representative trigger's table merges one-at-a-time
    against the finished stores — no thread pool, no sibling merges
    sharing the 32 cores — and report each table's isolated merge wall.
    Runs pipeline.merge_once, the SAME unit the contended sink runs per
    table, with the batch and the shared emote-occurrence extraction
    persisted AND materialized up front (in the contended sink they are
    computed once per trigger and shared), so the measured span is
    agg + totals-union + journaled additive merge — the identical code
    path merge_breakdown times.

    Caveat (by construction): the floor merges into the FINISHED
    stores, while the contended p50 averages mid-run merges against
    growing stores. At bench scale every store plateaus within the
    first batch (all flat, tens of KB — see store_bytes_final in
    merge_breakdown), so the comparison isolates contention; if a
    future table's store grows materially across the run, read the
    ratio against store_bytes_final before attributing it to the
    scheduler."""
    from pyspark.sql import functions as F

    from twitch_chat_analyser_spark import dims
    from twitch_chat_analyser_spark.operators import aggregations as agg
    from twitch_chat_analyser_spark.streaming import pipeline as sp

    files = sorted(
        os.path.join(src, f)
        for f in os.listdir(src)
        if f.endswith(".parquet")
    )[:8]  # one trigger's worth (maxFilesPerTrigger=8 of 64)
    batch_df = spark.read.parquet(*files).persist()
    batch_df.count()
    span = batch_df.agg(
        F.min(F.unix_millis("ts")).alias("min_ms"),
        F.max(F.unix_millis("ts")).alias("max_ms"),
    ).first()
    hint = [0] + list(range(
        int(span["min_ms"] // sp.DAY_MS),
        int(span["max_ms"] // sp.DAY_MS) + 2,
    ))
    emotes = dims.emotes_df(spark)
    occ = agg.emote_occurrences(batch_df, emotes).persist()
    occ.count()
    shared = {
        "emote_stats": lambda: agg.emote_stats_from_occurrences(occ),
        "user_emote_stats": (
            lambda: agg.user_emote_stats_from_occurrences(occ)
        ),
    }
    floor: dict[str, float] = {}
    # same trigger-sized shuffle parallelism as the contended sink, so
    # the isolated/contended comparison isolates CONTENTION only
    pipelines = sp.default_pipelines(spark)
    store_b = max(
        (
            sp._store_bytes(os.path.join(out_dir, p.name))
            for p in pipelines
        ),
        default=0,
    )
    any_bucketed = any(
        os.path.isdir(os.path.join(out_dir, p.name))
        and any(
            e.startswith("bucket=")
            for e in os.listdir(os.path.join(out_dir, p.name))
        )
        for p in pipelines
    )
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions",
        str(sp.trigger_shuffle_partitions(spark, batch_df.count(), store_b)),
    )
    try:
        for i, p in enumerate(pipelines):
            t0 = time.time()
            sp.merge_once(
                spark, out_dir, p, batch_df, shared,
                hint if any_bucketed else None, 10_000 + i,
            )
            floor[p.name] = round(time.time() - t0, 3)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
        occ.unpersist()
        batch_df.unpersist()
    return floor


def _merge_floor_table(isolated: dict, events: list[dict]) -> dict:
    """isolated-vs-contended per-merge table (the r9 done-condition the
    r10 verdict graded weak for living in prose): contended figures are
    the steady-state merges (batch_id >= 1) of the headline run."""
    per_table: dict[str, list[float]] = {}
    for e in events:
        if e.get("step") == "merge" and e.get("batch_id", 0) >= 1:
            per_table.setdefault(e["table"], []).append(e["merge_sec"])
    out = {}
    for name, iso in isolated.items():
        cont = sorted(per_table.get(name, []))
        c50 = cont[len(cont) // 2] if cont else None
        out[name] = {
            "isolated_merge_sec": iso,
            "contended_merge_sec_p50": c50,
            "contended_merge_sec_max": max(cont) if cont else None,
            "contention_ratio": (
                round(c50 / iso, 2) if cont and iso > 0 else None
            ),
        }
    return out


def _summarize_merges(events: list[dict]) -> dict:
    per_table: dict[str, dict] = {}
    steps: dict[str, list[float]] = {}
    for e in events:
        if e["step"] == "merge":
            t = per_table.setdefault(
                e["table"],
                {"layouts": [], "merge_sec": [], "store_bytes_final": 0},
            )
            if not t["layouts"] or t["layouts"][-1] != e["layout"]:
                t["layouts"].append(e["layout"])
            t["merge_sec"].append(e["merge_sec"])
            t["store_bytes_final"] = e["store_bytes"]
        else:
            steps.setdefault(e["step"], []).append(e["sec"])
    out = {}
    for name, t in per_table.items():
        out[name] = {
            "layouts": t["layouts"],
            "merges": len(t["merge_sec"]),
            "merge_sec_total": round(sum(t["merge_sec"]), 3),
            "merge_sec_max": max(t["merge_sec"]),
            "store_bytes_final": t["store_bytes_final"],
        }
    for name, secs in steps.items():
        out[name] = {"n": len(secs), "sec_total": round(sum(secs), 3),
                     "sec_max": max(secs)}
    return out


def _sqlite_wal_connect(db: str, timeout: float):
    """SQLite in its standard concurrent deployment mode: WAL journal +
    NORMAL sync. Module-level so Spark executors unpickle it by
    reference. Measured: WAL alone doesn't move the p50 (commit cost
    was never the bottleneck — upsert volume is), but it removes
    writer-lock stalls between the 5 tables' concurrent partitions."""
    import sqlite3

    conn = sqlite3.connect(db, timeout)
    conn.execute("PRAGMA journal_mode=WAL")
    conn.execute("PRAGMA synchronous=NORMAL")
    return conn


def _bench_streaming_jdbc(spark, sf_dir: str) -> dict:
    """Write-path throughput THROUGH the SQL upsert sink: one streaming
    query, each micro-batch fanned into all five fact aggregations and
    written by JdbcSink's executor-side foreachPartition writer into a
    SQLite database (qmark paramstyle; additive mode with the replay
    ledger — the full exactly-once discipline the reference's
    XAPostgresSink applies per batch)."""
    import functools
    import shutil
    import sqlite3
    import tempfile

    from twitch_chat_analyser_spark import ingest
    from twitch_chat_analyser_spark.streaming import jdbc as sj
    from twitch_chat_analyser_spark.streaming import pipeline as sp

    tmp = tempfile.mkdtemp(prefix="bench-jdbc-")
    try:
        src = os.path.join(tmp, "src")
        base = ingest.messages(spark, sf_dir).select(
            "ts", "channel", "username", "message"
        )
        n = base.count()
        # 16 files -> 4 micro-batches at maxFilesPerTrigger=4 (~25k
        # messages each). Trigger sizing vs the reference's 5 s budget
        # (job.example.properties:15): that budget is a FLUSH INTERVAL —
        # 5 s of live IRC traffic, i.e. a few thousand messages at the
        # reference's scale — so a 50k-message replay batch was ~2x an
        # already-generous trigger and compared an arbitrary replay
        # chunk against an interactive budget (the r8 "1.7x over
        # budget" was mostly this mismatch plus first-trigger JIT,
        # which jdbc_upsert_breakdown now makes visible per table).
        base.repartition(16).write.parquet(src)

        from twitch_chat_analyser_spark import dims
        from twitch_chat_analyser_spark.operators import aggregations as agg

        emotes = dims.emotes_df(spark)
        pipelines = sp.default_pipelines(spark)

        def one_run(i: int) -> dict:
            db = os.path.join(tmp, f"facts{i}.db")
            conn = sqlite3.connect(db)
            try:
                cur = conn.cursor()
                for table in sj.FACT_TABLES:
                    cur.execute(sj.create_table_sql(table))
                cur.execute(sj.ledger_table_sql())
                conn.commit()
            finally:
                conn.close()
            factory = functools.partial(_sqlite_wal_connect, db, 30.0)
            sc = spark.sparkContext
            accs = {
                p.name: (
                    sc.accumulator(0), sc.accumulator(0), sc.accumulator(0)
                )
                for p in pipelines
            }
            # executemany batch + writer partitions per table: tunable
            # like the reference's DB batch size (README.md:99-101 —
            # "throughput improves up to an optimal batch size").
            # Defaults are the r11 same-session sweep optimum on the
            # SQLite stand-in: steady p50 — 2000x4: 4,840 ms, 8000x4:
            # 4,383 ms, 8000x2: 3,871 ms (best; fewer single-writer
            # lock handoffs AND fewer executemany round-trips),
            # 20000x1: 4,346 ms (no Spark-side overlap left). A real
            # Postgres has row-level locks, so MORE partitions win
            # there — deployment knobs, not constants.
            batch_rows = int(os.environ.get("SPARK_GRAFT_JDBC_BATCH", "8000"))
            n_parts = int(os.environ.get("SPARK_GRAFT_JDBC_PARTS", "2"))
            sinks = {
                p.name: sj.JdbcSink(
                    dsn="unused",
                    table=p.name,
                    mode="additive",
                    batch_size=batch_rows,
                    connection_factory=factory,
                    num_partitions=n_parts,
                    paramstyle="qmark",
                    rows_acc=accs[p.name][0],
                    txn_acc=accs[p.name][1],
                    skip_acc=accs[p.name][2],
                )
                for p in pipelines
            }
            # per-(batch, table) upsert wall time — the instrumentation
            # the parquet path's merge_breakdown already has (VERDICT r8
            # #2): a p50 regression names its slow table instead of
            # guessing at SQLite locks vs executemany vs transform cost
            breakdown: list[dict] = []

            def sink(batch_df, batch_id: int) -> None:
                from concurrent.futures import ThreadPoolExecutor

                batch_df.persist()
                n_rows = batch_df.count()
                # ONE emote extraction per trigger shared by both emote
                # tables — same topology as the parquet single-pass sink
                # (run_all_single_pass); without it the twin double-ran
                # the largest repeated work item and its p50 measured it
                occ = agg.emote_occurrences(batch_df, emotes).persist()
                shared = {
                    "emote_stats": (
                        lambda: agg.emote_stats_from_occurrences(occ)
                    ),
                    "user_emote_stats": (
                        lambda: agg.user_emote_stats_from_occurrences(occ)
                    ),
                }

                def write_one(p) -> None:
                    # one FAIR pool per table (like the parquet sink's
                    # merge_one — the default pool is internally FIFO)
                    spark.sparkContext.setLocalProperty(
                        "spark.scheduler.pool", f"jdbc-{p.name}"
                    )
                    # no eager localCheckpoint: the stats feed exactly
                    # one consumer (the upsert), so checkpointing first
                    # ran every aggregation TWICE per trigger
                    t0 = time.time()
                    build = shared.get(
                        p.name, lambda: p.transform(batch_df)
                    )
                    sinks[p.name](build(), batch_id)
                    breakdown.append({
                        "batch_id": batch_id,
                        "table": p.name,
                        "sec": round(time.time() - t0, 3),
                    })

                old_parts = spark.conf.get("spark.sql.shuffle.partitions")
                try:
                    # trigger-sized shuffles, like run_all_single_pass
                    spark.conf.set(
                        "spark.sql.shuffle.partitions",
                        str(sp.trigger_shuffle_partitions(spark, n_rows)),
                    )
                    # concurrent like the parquet single-pass topology:
                    # Spark-side transforms overlap; SQLite's single-
                    # writer lock serializes only the commit sections
                    with ThreadPoolExecutor(
                        max_workers=len(pipelines)
                    ) as ex:
                        for f in [
                            ex.submit(write_one, p) for p in pipelines
                        ]:
                            f.result()
                finally:
                    spark.conf.set(
                        "spark.sql.shuffle.partitions", old_parts
                    )
                    occ.unpersist()
                    batch_df.unpersist()

            t0 = time.time()
            q = (
                spark.readStream.schema(
                    "ts timestamp, channel string, username string, "
                    "message string"
                )
                .option("maxFilesPerTrigger", 4)
                .parquet(src)
                .writeStream.foreachBatch(sink)
                .option(
                    "checkpointLocation", os.path.join(tmp, f"ckpt{i}")
                )
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            wall = time.time() - t0
            pcts = _percentiles(_trigger_durations([q.recentProgress]))
            # steady-state latency: batch 0 pays one-time JVM JIT/
            # codegen + SQLite page-cache warm-up; the budget the
            # reference's 5 s flush interval implies is about the
            # RECURRING trigger, so report the p50 with the warm-up
            # batch excluded alongside the all-batches number
            steady = _percentiles(_steady_durations([q.recentProgress]))
            return {
                "jdbc_wall_sec": round(wall, 3),
                "jdbc_msgs_per_sec": round(n / wall, 1),
                "jdbc_trigger_p50_ms": pcts.get("p50_ms"),
                "jdbc_trigger_p50_steady_ms": steady.get("p50_ms"),
                "jdbc_upsert_breakdown": breakdown,
                "jdbc_tables": {
                    name: {
                        "rows_upserted": a[0].value,
                        "txns": a[1].value,
                        "replay_skips": a[2].value,
                    }
                    for name, a in accs.items()
                },
            }

        # min-of-2 by steady p50, same protocol (and same rationale) as
        # the parquet twin — each run gets a FRESH database + checkpoint
        runs = [one_run(i) for i in range(2)]
        best = min(
            runs,
            key=lambda r: r["jdbc_trigger_p50_steady_ms"] or float("inf"),
        )
        return {
            "jdbc_messages": n,
            **best,
            "jdbc_runs": [
                {
                    k: v
                    for k, v in r.items()
                    if not isinstance(v, (dict, list))
                }
                for r in runs
            ],
            "timing_protocol": "min_of_2_runs_by_steady_p50",
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
