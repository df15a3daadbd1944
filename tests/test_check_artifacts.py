"""The artifact gate's budget assertions (VERDICT r10 task 2): the
checker must go RED on a doctored artifact — steady p50 over the
reference's 5 s trigger budget, missing steady fields, single-run
protocol, missing isolated-vs-contended table — and GREEN on a
compliant one. No Spark needed."""

from __future__ import annotations

import copy
import os
import sys

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tools"),
)

from check_artifacts import TRIGGER_BUDGET_MS, check_bench_budgets

GOOD = {
    "streaming": {
        "streaming_trigger_p50_steady_ms": 3900.0,
        "timing_protocol": "min_of_2_runs_by_steady_p50",
        "merge_isolated_vs_contended": {
            "channel_stats": {
                "isolated_merge_sec": 0.8,
                "contended_merge_sec_p50": 1.4,
            }
        },
    },
    "streaming_jdbc": {
        "jdbc_trigger_p50_steady_ms": 4200.0,
        "timing_protocol": "min_of_2_runs_by_steady_p50",
    },
}


def test_compliant_artifact_is_green():
    assert check_bench_budgets(copy.deepcopy(GOOD)) == []


def test_budget_breach_is_red():
    bad = copy.deepcopy(GOOD)
    bad["streaming"]["streaming_trigger_p50_steady_ms"] = (
        TRIGGER_BUDGET_MS + 1
    )
    probs = check_bench_budgets(bad)
    assert any("breaches" in p for p in probs)


def test_jdbc_budget_breach_is_red():
    bad = copy.deepcopy(GOOD)
    bad["streaming_jdbc"]["jdbc_trigger_p50_steady_ms"] = 5825.0
    probs = check_bench_budgets(bad)
    assert any("breaches" in p and "jdbc" in p for p in probs)


def test_missing_steady_field_is_red():
    bad = copy.deepcopy(GOOD)
    del bad["streaming"]["streaming_trigger_p50_steady_ms"]
    probs = check_bench_budgets(bad)
    assert any("missing steady-state" in p for p in probs)


def test_single_run_protocol_is_red():
    bad = copy.deepcopy(GOOD)
    del bad["streaming_jdbc"]["timing_protocol"]
    probs = check_bench_budgets(bad)
    assert any("min-of-2" in p for p in probs)


def test_missing_isolated_table_is_red():
    bad = copy.deepcopy(GOOD)
    del bad["streaming"]["merge_isolated_vs_contended"]
    probs = check_bench_budgets(bad)
    assert any("merge_isolated_vs_contended" in p for p in probs)


def test_unmarked_eval_query_is_red():
    bad = copy.deepcopy(GOOD)
    bad["queries"] = {"eval_lsh_recall": 1.0, "channel_stats": 0.5}
    bad["eval_queries_excluded_from_regression"] = []
    probs = check_bench_budgets(bad)
    assert any("eval_lsh_recall" in p for p in probs)
    bad["eval_queries_excluded_from_regression"] = ["eval_lsh_recall"]
    assert check_bench_budgets(bad) == []
