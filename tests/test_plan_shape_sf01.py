"""Bench-scale PHYSICAL join pinning (VERDICT r12 item 2).

The r12 review removed forced broadcast hints from the SF-scaled join
sides (tfidf's document-frequency table, bpe_encode's symbol table, the
TPC-H customer/part/supplier sides): the claim that keeps the bench
honest is that at sf0.1 the optimizer STILL resolves those joins to
broadcast from its size estimates (statically or via AQE's runtime
re-plan). ``test_plan_shape.py`` pins only the no-hint logical shape at
sf0.001; a future stats/estimate drift that flips these joins to
sort-merge at bench scale would read as a silent 2x bench delta blamed
on the box. These tests EXECUTE each plan at sf0.1 and assert the FINAL
adaptive plan's join strategy, so that drift becomes a named red test.

A negative control asserts the pin is meaningful: with
autoBroadcastJoinThreshold forced to -1 the same join must NOT
broadcast (if it still did, the positive assertions would be
vacuously green).
"""

from __future__ import annotations

import pytest

from twitch_chat_analyser_spark import ingest

SF01 = "/root/testdata/sf0.1"

pytestmark = pytest.mark.skipif(
    not __import__("os").path.isdir(SF01),
    reason="bench-scale dataset not present",
)


def final_plan(df) -> str:
    """Execute the df's OWN QueryExecution (internal-row count — no
    driver collect, no extra plan wrapped on top) so AQE finalizes, then
    return the final physical plan string."""
    df._jdf.queryExecution().toRdd().count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the finalized AdaptiveSparkPlan prints BOTH sections; the join
    # assertions are about what actually RAN, so drop the initial plan
    return plan.split("== Initial Plan ==")[0]


def _broadcast_joins(plan: str) -> int:
    # the hinted 1-row sides (n_docs etc.) plan as BroadcastNestedLoopJoin
    # when the join is a crossJoin — both are broadcast resolutions
    return plan.count("BroadcastHashJoin") + plan.count(
        "BroadcastNestedLoopJoin"
    )


def test_tfidf_df_join_broadcasts_at_bench_scale(spark):
    from twitch_chat_analyser_spark.operators import sampling

    docs = ingest.load(spark, SF01, "documents")
    plan = final_plan(sampling.tfidf_top_terms(docs))
    assert "isFinalPlan=true" in plan
    # the unhinted vocabulary-sized df join must still resolve to
    # broadcast at sf0.1 (plus the hinted 1-row n_docs broadcast)
    assert _broadcast_joins(plan) >= 2, plan
    assert "SortMergeJoin" not in plan, plan


def test_bpe_encode_symbol_join_broadcasts_at_bench_scale(spark):
    """At sf0.1 the r13 driver escape kicks in (documents are under the
    corpus-size gate), so the encoder join's build side is the
    driver-built symbol LocalRelation — it must still broadcast."""
    from twitch_chat_analyser_spark.operators import textops

    docs = ingest.load(spark, SF01, "documents")
    plan = final_plan(textops.bpe_encode(docs))
    assert "isFinalPlan=true" in plan
    # the word->syms encoder join must not fall back to a corpus shuffle
    assert "SortMergeJoin" not in plan, plan
    assert _broadcast_joins(plan) >= 1, plan


def test_bpe_encode_distributed_loop_broadcasts_at_bench_scale(
    spark, monkeypatch
):
    """The ORIGINAL r12 pin, kept meaningful past the driver escape:
    with the gate forced off, the distributed loop's unhinted symbol
    join (and in-loop argmax crossJoins) must still resolve to
    broadcast at sf0.1 — this is the shape the 100 TB path plans."""
    from twitch_chat_analyser_spark.operators import textops

    monkeypatch.setattr(textops, "BPE_DRIVER_CORPUS_BYTES", -1)
    docs = ingest.load(spark, SF01, "documents")
    plan = final_plan(textops.bpe_encode(docs))
    assert "isFinalPlan=true" in plan
    assert "SortMergeJoin" not in plan, plan
    assert _broadcast_joins(plan) >= 1, plan


@pytest.mark.parametrize(
    "qname",
    ["q10_returned_items", "q19_disjunctive_revenue", "q7_volume_shipping"],
)
def test_tpch_scaled_sides_broadcast_at_bench_scale(spark, qname):
    """customer (q10), part (q19), supplier+customer chain (q7): the
    r12 unhinted SF-scaled sides must still broadcast at sf0.1."""
    from twitch_chat_analyser_spark.plans import tpch

    plan = final_plan(getattr(tpch, qname)(spark, SF01))
    assert "isFinalPlan=true" in plan
    assert "SortMergeJoin" not in plan, plan
    assert _broadcast_joins(plan) >= 1, plan


def test_negative_control_threshold_off_flips_to_shuffle_join(spark):
    """With auto-broadcast disabled the tfidf df join must STOP
    broadcasting — proof the positive assertions above are pinning a
    size-estimate decision, not something a hint or rule forces."""
    from twitch_chat_analyser_spark.operators import sampling

    keys = [
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
    ]
    old = {}
    for k in keys:
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, "-1")
    try:
        docs = ingest.load(spark, SF01, "documents")
        plan = final_plan(sampling.tfidf_top_terms(docs))
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
