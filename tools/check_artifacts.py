"""Artifact-contract self-check: catches registry/bench drift in-round.

Checks (no SparkSession needed):
1. ``oracle_sql()`` names == ``queries()`` names minus the ROWS_ONLY
   allowlist (an operator without an oracle silently downgrades its
   correctness evidence; an oracle without a query is dead weight).
2. ROWS_ONLY entries never carry an oracle (else the allowlist lies).
3. If ``BENCH_FULL.json`` exists: its total equals the sum of its
   per-query timings, its query names match the registry, and every
   headline name bench prints is present.

Run standalone or via tools/check_correctness.py (the gate).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


# the reference's flush interval (job.example.properties:15): the
# recurring trigger must complete inside it or the pipeline falls
# permanently behind live traffic
TRIGGER_BUDGET_MS = 5000


def check_bench_protocol(b: dict) -> list[str]:
    """Assert the r13 per-query timing protocol (VERDICT r12 item 1 —
    the r11 builder/driver >1.5x disagreement contingency triggered):
    every query records its raw runs; any query whose runs spread
    beyond the threshold must have been escalated to a 3rd run with
    the median reported; queries still spread after escalation are
    named in ``measurement_suspect``; and the artifact carries load
    telemetry so a contaminated run is self-identifying. A doctored
    artifact (high-spread query with only 2 runs, or a timing that is
    neither the min-of-2 nor the median-of-3) goes red here."""
    problems: list[str] = []
    runs = b.get("queries_runs")
    timings = b.get("queries", {})
    thr = b.get("spread_suspect_threshold")
    if not isinstance(runs, dict) or not runs:
        return ["BENCH_FULL missing per-query raw runs 'queries_runs'"]
    if not isinstance(thr, (int, float)):
        problems.append(
            "BENCH_FULL missing 'spread_suspect_threshold' (the "
            "escalate-to-3-runs cutoff must live in the artifact)"
        )
        thr = 1.5
    for field in ("loadavg_start", "loadavg_end"):
        if not isinstance(b.get(field), list) or len(b.get(field) or []) != 3:
            problems.append(
                f"BENCH_FULL missing load telemetry '{field}' "
                "(1/5/15-min os.getloadavg triple)"
            )
    suspect = b.get("measurement_suspect")
    if suspect is None:
        problems.append(
            "BENCH_FULL missing 'measurement_suspect' (queries whose "
            "runs still disagree after escalation)"
        )
        suspect = []
    expect_suspect = sorted(
        n
        for n, r in runs.items()
        if r and max(r) / max(min(r), 1e-9) > thr + 1e-9
    )
    if sorted(suspect) != expect_suspect:
        problems.append(
            "BENCH_FULL measurement_suspect does not match the recorded "
            f"run spreads: artifact={sorted(suspect)} "
            f"recomputed={expect_suspect}"
        )
    for name, r in runs.items():
        if len(r) < 2:
            problems.append(
                f"BENCH_FULL queries_runs[{name!r}] has {len(r)} run(s); "
                "the protocol requires at least 2"
            )
            continue
        two_spread = max(r[:2]) / max(min(r[:2]), 1e-9)
        if two_spread > thr + 1e-9 and len(r) < 3:
            problems.append(
                f"BENCH_FULL {name}: 2-run spread {two_spread:.2f} "
                f"exceeds {thr} but no escalation run was recorded"
            )
        t = timings.get(name)
        if t is None:
            continue
        expected = sorted(r)[1] if len(r) >= 3 else min(r)
        if abs(t - expected) > 1e-9:
            problems.append(
                f"BENCH_FULL {name}: reported {t} is not the "
                f"{'median-of-3' if len(r) >= 3 else 'min-of-2'} of its "
                f"recorded runs {r}"
            )
    return problems


def check_bench_budgets(b: dict) -> list[str]:
    """Assert the streaming twins' steady-state p50s are PRESENT and
    UNDER the reference's 5 s trigger budget, and that the measurement
    protocol is the repeated one (r9 task 4, graded weak in r10: the
    fields were emitted but nothing asserted them, so a silent budget
    regression passed the gate)."""
    problems: list[str] = []
    for sec_name, field in (
        ("streaming", "streaming_trigger_p50_steady_ms"),
        ("streaming_jdbc", "jdbc_trigger_p50_steady_ms"),
    ):
        sec = b.get(sec_name, {})
        val = sec.get(field)
        if val is None:
            problems.append(
                f"BENCH_FULL.{sec_name} missing steady-state trigger "
                f"p50 field '{field}'"
            )
        elif val > TRIGGER_BUDGET_MS:
            problems.append(
                f"BENCH_FULL.{sec_name}.{field} = {val} ms breaches the "
                f"reference's {TRIGGER_BUDGET_MS} ms trigger budget"
            )
        if sec and sec.get("timing_protocol") != "min_of_2_runs_by_steady_p50":
            problems.append(
                f"BENCH_FULL.{sec_name} is not measured min-of-2 "
                f"(timing_protocol={sec.get('timing_protocol')!r}) — "
                "single-run twin numbers cannot rebut box noise"
            )
    if not b.get("streaming", {}).get("merge_isolated_vs_contended"):
        problems.append(
            "BENCH_FULL.streaming missing the isolated-vs-contended "
            "per-merge table 'merge_isolated_vs_contended' (the r9/r10 "
            "done-condition: contention evidence lives in the artifact, "
            "not prose)"
        )
    # r14: eval ground-truth construction is hoisted OUT of the timed
    # region into the index-build phase (VERDICT r13 item 6) and its
    # cost must be a named artifact field — the old
    # eval_queries_excluded_from_regression carve-out is retired (with
    # warm truth, eval_* run-1 ~= run-2 and the regression read is
    # honest again). An artifact missing the truth-build fields would
    # mean the first timed run silently pays the truth cost again.
    idx = b.get("index_build", {})
    for field in ("ivf_truth_sec", "jaccard_truth_sec"):
        if not isinstance(idx.get(field), (int, float)):
            problems.append(
                f"BENCH_FULL index_build missing '{field}' (eval ground "
                "truth must be built and timed outside the query sweep)"
            )
    if "eval_queries_excluded_from_regression" in b:
        problems.append(
            "BENCH_FULL still carries the retired "
            "eval_queries_excluded_from_regression carve-out (truth is "
            "prebuilt in index_build since r14; eval queries are "
            "regression-checked like every other query)"
        )
    return problems


def check() -> list[str]:
    import __spark_entry__ as entrymod
    from twitch_chat_analyser_spark.registry import ROWS_ONLY

    problems: list[str] = []
    qnames = set(entrymod.queries())
    onames = set(entrymod.oracle_sql())

    missing_oracle = qnames - onames - ROWS_ONLY
    if missing_oracle:
        problems.append(
            f"queries without oracle and not in ROWS_ONLY: {sorted(missing_oracle)}"
        )
    dead_oracles = onames - qnames
    if dead_oracles:
        problems.append(f"oracles without a query: {sorted(dead_oracles)}")
    contradicted = ROWS_ONLY & onames
    if contradicted:
        problems.append(f"ROWS_ONLY entries that DO have oracles: {sorted(contradicted)}")
    unknown_allow = ROWS_ONLY - qnames
    if unknown_allow:
        problems.append(f"ROWS_ONLY names not in queries(): {sorted(unknown_allow)}")

    bench_full = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "BENCH_FULL.json"
    )
    if os.path.isfile(bench_full):
        with open(bench_full) as fh:
            b = json.load(fh)
        timings = b.get("queries", {})
        if set(timings) != qnames:
            problems.append(
                "BENCH_FULL query names drifted from the registry: "
                f"missing={sorted(qnames - set(timings))} "
                f"extra={sorted(set(timings) - qnames)}"
            )
        total = round(sum(timings.values()), 3)
        if abs(b.get("value", 0) - total) > 0.01:
            problems.append(
                f"BENCH_FULL total {b.get('value')} != sum of timings {total}"
            )
        if b.get("n_queries") != len(timings):
            problems.append(
                f"BENCH_FULL n_queries {b.get('n_queries')} != {len(timings)}"
            )
        import bench

        missing_headline = [n for n in bench.HEADLINE if n not in timings]
        if missing_headline:
            problems.append(f"headline queries missing: {missing_headline}")
        # the streaming instrumentation is load-bearing (it is how a
        # throughput regression names its cause); its absence means the
        # bench silently lost its breakdown
        for section, fields in (
            ("streaming", ["merge_breakdown"]),
            ("streaming_jdbc", ["jdbc_upsert_breakdown", "jdbc_tables"]),
        ):
            sec = b.get(section, {})
            for f in fields:
                if not sec.get(f):
                    problems.append(
                        f"BENCH_FULL.{section} missing instrumentation "
                        f"field '{f}'"
                    )
        problems += check_bench_budgets(b)
        problems += check_bench_protocol(b)

    # every round bench artifact must be valid JSON with a parsed bench
    # line (VERDICT r8 nit: BENCH_r01 has parsed=null — its tail is
    # truncated mid-line, so the line is unrecoverable; grandfathered
    # by name, any FUTURE null fails the check)
    _parsed_null_legacy = {"BENCH_r01.json"}
    root = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    for fname in sorted(os.listdir(root)):
        if not (fname.startswith("BENCH_r") and fname.endswith(".json")):
            continue
        try:
            with open(os.path.join(root, fname)) as fh:
                art = json.load(fh)
        except (OSError, json.JSONDecodeError) as e:
            problems.append(f"{fname} is not valid JSON: {e}")
            continue
        if fname in _parsed_null_legacy:
            continue
        if not isinstance(art, dict):
            # valid JSON but not an object (e.g. a bare null or list
            # from a corrupted write) — report, don't crash the gate
            problems.append(
                f"{fname} is not a JSON object: {type(art).__name__}"
            )
            continue
        parsed = art.get("parsed")
        if not isinstance(parsed, dict) or "metric" not in parsed:
            problems.append(
                f"{fname} has no parsed bench line (parsed={parsed!r}) — "
                "the bench run's JSON line was lost or malformed"
            )

    corr_full = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..",
        "CORRECTNESS_FULL.json",
    )
    if os.path.isfile(corr_full):
        with open(corr_full) as fh:
            c = json.load(fh)
        centries = c.get("queries", {})
        if set(centries) != qnames:
            problems.append(
                "CORRECTNESS_FULL query names drifted from the registry: "
                f"missing={sorted(qnames - set(centries))} "
                f"extra={sorted(set(centries) - qnames)}"
            )
        bad = sorted(
            n for n, e in centries.items()
            if e.get("err") is not None
            or (n not in ROWS_ONLY and e.get("hash_match") is not True)
            or (n in ROWS_ONLY and not e.get("spark_rows"))
        )
        if bad:
            problems.append(f"CORRECTNESS_FULL non-green entries: {bad}")

    # Cross-scale gate (VERDICT r11 task 2): the sf0.1 oracle sweep is
    # REQUIRED, must cover the whole registry minus the declared
    # quadratic-oracle exclusions, and must be green — a scale-dependent
    # wrong answer (overflow, cardinality-sensitive rewrite, float fold
    # order) passes the sf0.01 gate and would otherwise poison every
    # bench number silently.
    from twitch_chat_analyser_spark.registry import SCALE_EXCLUDED

    corr_scale = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..",
        "CORRECTNESS_SCALE.json",
    )
    if not os.path.isfile(corr_scale):
        problems.append(
            "CORRECTNESS_SCALE.json missing — run "
            "`python tools/check_correctness.py /root/testdata/sf0.1` "
            "to produce the cross-scale oracle artifact"
        )
    else:
        with open(corr_scale) as fh:
            cs = json.load(fh)
        problems += check_scale_artifact(
            cs, qnames, SCALE_EXCLUDED, ROWS_ONLY
        )
    return problems


def check_scale_artifact(
    cs: dict,
    qnames: set,
    scale_excluded: dict,
    rows_only: frozenset = frozenset(),
) -> list[str]:
    """Validate the cross-scale oracle artifact (CORRECTNESS_SCALE):
    produced at a non-sf0.01 dir, exclusions in sync with the registry's
    declared quadratic-oracle list (each with a written reason), full
    coverage of every non-excluded query, and zero non-green entries."""
    problems: list[str] = []
    sentries = cs.get("queries", {})
    declared_excl = set(cs.get("excluded", {}))
    if declared_excl != set(scale_excluded):
        problems.append(
            "CORRECTNESS_SCALE exclusion list drifted from "
            "registry.SCALE_EXCLUDED: "
            f"artifact-only={sorted(declared_excl - set(scale_excluded))} "
            f"registry-only={sorted(set(scale_excluded) - declared_excl)}"
        )
    want = qnames - set(scale_excluded)
    if set(sentries) != want:
        problems.append(
            "CORRECTNESS_SCALE coverage drifted from the registry "
            "(every non-excluded query must be checked at scale): "
            f"missing={sorted(want - set(sentries))} "
            f"extra={sorted(set(sentries) - want)}"
        )
    if os.path.basename(
        os.path.normpath(cs.get("sf_dir", ""))
    ) == "sf0.01":
        problems.append(
            "CORRECTNESS_SCALE was produced at sf0.01 — the whole "
            "point is the 10x-up check; rerun at the bench sf dir"
        )
    sbad = sorted(
        n for n, e in sentries.items()
        if e.get("err") is not None
        or (n not in rows_only and e.get("hash_match") is not True)
        or (n in rows_only and not e.get("spark_rows"))
    )
    if sbad:
        problems.append(f"CORRECTNESS_SCALE non-green entries: {sbad}")
    unknown_excl = set(scale_excluded) - qnames
    if unknown_excl:
        problems.append(
            f"SCALE_EXCLUDED names not in queries(): {sorted(unknown_excl)}"
        )
    empty_reason = sorted(
        n for n, r in scale_excluded.items() if not str(r).strip()
    )
    if empty_reason:
        problems.append(
            f"SCALE_EXCLUDED entries without a reason: {empty_reason}"
        )
    return problems


def main() -> int:
    problems = check()
    for p in problems:
        print(f"  ARTIFACT DRIFT: {p}")
    print(
        "artifact contract OK"
        if not problems
        else f"artifact contract: {len(problems)} problem(s)"
    )
    return 1 if problems else 0


if __name__ == "__main__":
    raise SystemExit(main())
