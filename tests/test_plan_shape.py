"""Physical-plan shape assertions — the scale contract (SURVEY.md §4.3).

Correctness tests prove the small-SF answer; these prove the PLAN is the
one that survives 100x data: dimension joins broadcast (no fact-table
shuffle for the join), filters reach the parquet scan (PushedFilters),
global top-k is TakeOrderedAndProject (no full sort), and the relational
hot paths stay inside whole-stage codegen with zero Python nodes.
"""

from __future__ import annotations

import contextlib
import io

import pytest

from twitch_chat_analyser_spark import dims, ingest
from twitch_chat_analyser_spark.operators import aggregations as agg
from twitch_chat_analyser_spark.plans import api, tpch


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_tpch_q3_broadcasts_customer_and_pushes_date_filters(spark, sf_dir):
    plan = plan_of(tpch.q3_shipping_priority(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    # date predicates reach the parquet scans (partition/row-group pruning
    # at scale). l_shipdate arrives as nanos BIGINT, so the pushed filter
    # is on the raw long column.
    assert "PushedFilters" in plan
    assert plan.count("IsNotNull") >= 2
    # global top-10 must be TakeOrderedAndProject, not Sort+Limit
    assert "TakeOrderedAndProject" in plan


def test_tpch_q5_dimension_chain_broadcasts(spark, sf_dir):
    plan = plan_of(tpch.q5_local_supplier_volume(spark, sf_dir))
    # region->nation->customer chain collapses into broadcast joins;
    # lineitem/orders never shuffle for those joins
    assert plan.count("BroadcastHashJoin") >= 2


def test_emote_stats_broadcasts_dim_and_stays_jvm_side(spark, sf_dir):
    df = agg.emote_stats(ingest.messages(spark, sf_dir), dims.emotes_df(spark))
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan  # emotes dim semi-join (A9)
    assert "Python" not in plan  # explode+join, no UDF
    # the dim must be a literal plan (Range->Generate), not an RDD scan
    assert "ExistingRDD" not in plan


def test_range_series_pushes_channel_and_bounds(spark, sf_dir):
    df = api.range_series(
        agg.channel_stats(ingest.messages(spark, sf_dir)),
        api.CHANNEL,
        api.START_MS,
        api.END_MS,
    )
    plan = plan_of(df)
    # the channel predicate prunes BEFORE aggregation: it must appear as
    # a scan-level pushed filter on events' event_type column
    assert "PushedFilters" in plan
    assert "event_type" in plan and "click" in plan


def test_top_emotes_is_take_ordered(spark, sf_dir):
    df = api.top_emotes_window(
        agg.emote_stats(ingest.messages(spark, sf_dir), dims.emotes_df(spark)),
        api.CHANNEL,
        api.START_MS,
        api.END_MS,
        10,
    )
    assert "TakeOrderedAndProject" in plan_of(df)


def test_write_path_aggregations_partial_before_shuffle(spark, sf_dir):
    """groupBy compiles to partial + final HashAggregate around ONE
    shuffle — the map-side combine the reference hand-rolled (A5/A6)."""
    plan = plan_of(agg.channel_stats(ingest.messages(spark, sf_dir)))
    assert plan.count("HashAggregate") >= 2
    assert "partial_count" in plan


@pytest.mark.parametrize(
    "name",
    [
        "channel_stats",
        "user_stats",
        "emote_stats",
        "user_emote_stats",
        "phrase_stats",
        "tpch_q1_pricing_summary",
        "b4_top_chatters",
        "b14_cumulative_series",
        "dedup_minhash_lsh",
        "text_language_id",
    ],
)
def test_no_python_nodes_in_relational_hot_paths(spark, sf_dir, name):
    from twitch_chat_analyser_spark.registry import queries

    plan = plan_of(queries()[name](spark, sf_dir))
    assert "Python" not in plan, f"{name} fell out of codegen:\n{plan[:2000]}"

def test_exists_decorrelates_to_semi_join(spark, sf_dir):
    from twitch_chat_analyser_spark.plans import subqueries

    plan = plan_of(subqueries.exists_high_qty_orders(spark, sf_dir))
    # Catalyst must rewrite EXISTS into a semi join (hash or broadcast),
    # never a per-row subquery
    assert "LeftSemi" in plan
    assert "PushedFilters" in plan  # quantity + date predicates reach scans


def test_not_exists_decorrelates_to_anti_join(spark, sf_dir):
    from twitch_chat_analyser_spark.plans import subqueries

    plan = plan_of(subqueries.not_exists_lapsed_customers(spark, sf_dir))
    assert "LeftAnti" in plan


def test_correlated_scalar_subquery_becomes_aggregate_join(spark, sf_dir):
    from twitch_chat_analyser_spark.plans import subqueries

    plan = plan_of(subqueries.small_quantity_revenue(spark, sf_dir))
    # the per-partkey avg is an aggregate joined back, not a loop
    assert "HashAggregate" in plan
    assert plan.count("Join") >= 2
    assert "Python" not in plan


def test_q19_disjunctive_predicates_push_below_join(spark, sf_dir):
    from twitch_chat_analyser_spark.plans import tpch

    plan = plan_of(tpch.q19_disjunctive_revenue(spark, sf_dir))
    # the OR-of-ANDs must not block pushdown entirely: the common
    # l_partkey join key stays an equi-join (broadcast) and per-table
    # predicate fragments reach the scans
    assert "BroadcastHashJoin" in plan
    assert "PushedFilters" in plan
    assert "Python" not in plan


def test_q10_top20_is_take_ordered(spark, sf_dir):
    from twitch_chat_analyser_spark.plans import tpch

    plan = plan_of(tpch.q10_returned_items(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "Python" not in plan


def test_q2_min_supplier_is_aggregate_join(spark, sf_dir):
    from twitch_chat_analyser_spark.plans import tpch

    plan = plan_of(tpch.q2_min_acctbal_supplier(spark, sf_dir))
    assert "HashAggregate" in plan
    assert "Python" not in plan


def test_q4_exists_is_semi_join_with_pushed_dates(spark, sf_dir):
    plan = plan_of(tpch.q4_order_priority(spark, sf_dir))
    # EXISTS must plan as a semi join; the quarter bounds reach the
    # orders scan so only ~1/24 of orders ever probes the join
    assert "LeftSemi" in plan
    assert "PushedFilters" in plan
    assert "Python" not in plan


def test_q9_dimension_sides_broadcast(spark, sf_dir):
    plan = plan_of(tpch.q9_product_type_profit(spark, sf_dir))
    # part/supplier/nation all broadcast — lineitem shuffles only for
    # the orders join and the final group-by
    assert plan.count("BroadcastHashJoin") >= 3


def test_q11_threshold_is_one_row_broadcast(spark, sf_dir):
    plan = plan_of(tpch.q11_important_parts(spark, sf_dir))
    # the global-total scalar is a broadcast nested-loop over one row,
    # not a shuffle of the per-part aggregate
    assert "BroadcastNestedLoopJoin" in plan
    assert "Python" not in plan


def test_q16_complaints_anti_join_broadcasts(spark, sf_dir):
    plan = plan_of(tpch.q16_supplier_part_counts(spark, sf_dir))
    assert "LeftAnti" in plan
    # distinct-count plans as the two-phase expand/aggregate — at least
    # partial+final HashAggregate pairs, never a global distinct sort
    assert plan.count("HashAggregate") >= 2
    assert "Python" not in plan


def test_q18_top100_is_take_ordered(spark, sf_dir):
    plan = plan_of(tpch.q18_large_volume_customers(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    # the HAVING aggregate is computed once: exactly one grouping of
    # lineitem by orderkey (partial+final pair), no second fact pass
    assert "Python" not in plan


def test_q22_global_avg_broadcast_and_anti_join(spark, sf_dir):
    plan = plan_of(tpch.q22_dormant_rich_customers(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan  # one-row avg gate
    assert "LeftAnti" in plan  # NOT EXISTS dormancy probe
    assert "Python" not in plan


def _partitionless_windows(plan: str) -> list[str]:
    """windowspecdefinition(...) whose FIRST argument is a sort item
    (ASC/DESC) has no partition spec — every row funnels through one
    WindowExec partition.

    Exemption: a window ordering by the internal ``_pid`` column is the
    distributed rank's prefix-offset cumsum over the per-partition
    COUNTS frame — at most one row per shuffle partition, bounded by
    configuration, not by the data (analytics.global_row_number)."""
    import re

    out = []
    for m in re.finditer(r"windowspecdefinition\(([^)]*)", plan):
        first = m.group(1).split(",")[0]
        if ("ASC" in first or "DESC" in first) and not first.strip().startswith(
            "_pid#"
        ):
            out.append(m.group(0))
    return out


@pytest.mark.parametrize(
    "name", ["b18_pct_of_total", "user_activity_quartiles"]
)
def test_total_order_ranks_are_distributed(spark, sf_dir, name):
    """Full-result rankings (B18 percentage-of-total, quartiles) must
    use the two-phase distributed rank: a _pid-partitioned window over
    range-partitioned data, never a partition-less WindowExec over the
    user rows. The range-partitioned frame must be materialized once
    (localCheckpoint -> ExistingRDD scan) so the counts and rank
    branches can't observe different sampled partition boundaries."""
    from twitch_chat_analyser_spark.registry import queries

    plan = plan_of(queries()[name](spark, sf_dir))
    bad = _partitionless_windows(plan)
    assert not bad, f"{name} has partition-less window(s): {bad}"
    assert "ExistingRDD" in plan, (
        f"{name}: range-partitioned frame not materialized — counts and "
        "ranks may see different RangePartitioner boundary samples"
    )


@pytest.mark.parametrize(
    "name",
    [
        "dedup_exact",
        "dedup_minhash_lsh",
        "dedup_simhash",
        "dedup_ngram_jaccard",
        "dedup_embedding_cosine",
    ],
)
def test_no_quadratic_pair_join_in_dedup_family(spark, sf_dir, name):
    """Every near-dup pair generator is banded: candidates come from an
    equi-join on a bucket key (minhash slot / simhash block / hyperplane
    band signature), NEVER an all-pairs product. The only nested-loop
    join allowed is the embedding sign computation against the
    broadcast plane set (|planes| = 16, bounded)."""
    from twitch_chat_analyser_spark.registry import queries

    plan = plan_of(queries()[name](spark, sf_dir))
    assert "CartesianProduct" not in plan, f"{name} has an all-pairs join"
    if name == "dedup_embedding_cosine":
        # only the bounded broadcast over the 16 hyperplanes (appears
        # once per side of the band self-join — both linear passes);
        # formatted explain prints each node twice (tree + detail), so
        # 2 physical nodes = 4 string hits. The pair join itself must
        # be a hash/sort-merge equi-join.
        assert plan.count("BroadcastNestedLoopJoin") <= 4
        # r14: banding is a map-side fold, so the banded side carries a
        # real (corpus-proportional) size estimate and the planner may
        # legitimately broadcast it at test scale — any EQUI-join
        # strategy is fine, only an all-pairs product is banned
        assert (
            "SortMergeJoin" in plan
            or "ShuffledHashJoin" in plan
            or "BroadcastHashJoin" in plan
        )
    else:
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name} fell back to a nested-loop join:\n{plan[:2000]}"
        )


@pytest.mark.parametrize(
    "name", ["dedup_semantic_clusters", "dedup_dup_ngram_fraction"]
)
def test_new_dedup_family_members_are_not_quadratic(spark, sf_dir, name):
    """SemDeDup's pair join is an equi-join on centroid_id (the only
    nested loops are the bounded broadcast of k centroids in the Lloyd
    rounds / assignment); the dup-ngram signal has no pair join at all —
    one window over the shingle hash."""
    from twitch_chat_analyser_spark.registry import queries

    plan = plan_of(queries()[name](spark, sf_dir))
    assert "CartesianProduct" not in plan, f"{name} has an all-pairs join"
    if name == "dedup_dup_ngram_fraction":
        assert "BroadcastNestedLoopJoin" not in plan
        assert not _partitionless_windows(plan), "ngram window lost its key"


def test_span_removal_is_not_quadratic(spark, sf_dir):
    """The exact-substring rewrite never joins the corpus against
    itself: first-occurrence ranking is a window PARTITIONED by the gram
    hash, and the cover/token joins are equi-joins on (doc_id, pos).
    JVM-only end to end."""
    from twitch_chat_analyser_spark.registry import queries

    plan = plan_of(queries()["dedup_span_removal"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert not _partitionless_windows(plan), "gram window lost its key"
    assert "Python" not in plan


def test_cluster_representatives_window_is_cluster_partitioned(
    spark, sf_dir
):
    """The keep-best argmax must rank inside each cluster (bounded
    partitions), never through one global window."""
    from twitch_chat_analyser_spark.registry import queries

    plan = plan_of(queries()["dedup_cluster_representatives"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert not _partitionless_windows(plan), "argmax window lost its key"


def test_phrase_search_indexed_never_scans_the_corpus(spark, sf_dir):
    """The postings-backed phrase search must answer from the prebuilt
    index ONLY: the plan scans the bucketed postings table with the
    gram filter pushed into the scan (bucket pruning engaged —
    SelectedBucketsCount) and never touches documents.parquet; the
    (offset, gram) probe frame broadcasts."""
    from twitch_chat_analyser_spark.operators import llmops

    df = llmops._q_phrase_search_indexed(spark, sf_dir)
    plan = plan_of(df)
    assert "documents" not in plan, "corpus scanned at query time"
    assert "phrase_postings" in plan
    assert "SelectedBucketsCount" in plan, "bucket pruning not engaged"
    assert "EqualTo(gram" in plan or "In(gram" in plan, (
        "gram filter not pushed to the postings scan"
    )
    assert "BroadcastHashJoin" in plan
    assert "Python" not in plan


def test_phrase_search_indexed_matches_scan_variant(spark, sf_dir):
    """Same answer from the index as from the corpus scan — including
    multi-occurrence counts and whitespace-split phrases."""
    from twitch_chat_analyser_spark.operators import llmops
    from twitch_chat_analyser_spark.operators.llmops import (
        build_phrase_postings,
        phrase_search,
        phrase_search_indexed,
    )

    rows = [
        (1, "alpha the red fox runs beta", "en", "s", 27),
        (2, "the red fox runs and the red fox runs", "en", "s", 37),
        (3, "red fox runs the", "en", "s", 16),
        (4, "start big\norder scan end", "en", "s", 24),
        (5, "short", "en", "s", 5),
    ]
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    docs = spark.createDataFrame(rows, schema)
    postings = build_phrase_postings(docs)
    for phrase in ("the red fox runs", "big order scan"):
        via_scan = {
            (r["doc_id"], r["occurrences"])
            for r in phrase_search(docs, phrase).collect()
        }
        via_index = {
            (r["doc_id"], r["occurrences"])
            for r in phrase_search_indexed(postings, phrase).collect()
        }
        assert via_index == via_scan
    # short phrases are the scan path's job
    import pytest as _pytest

    with _pytest.raises(ValueError):
        phrase_search_indexed(postings, "fox runs")


def test_bpe_rank_is_staged_after_topk_cut(spark, sf_dir):
    """The BPE pair rank is a global window, but it runs on the <= top_n
    rows surviving a TakeOrderedAndProject — the staged leaderboard
    pattern, not a corpus-wide single-partition sort."""
    from twitch_chat_analyser_spark.registry import queries

    plan = plan_of(queries()["text_bpe_merge_candidates"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "Python" not in plan
    assert "CartesianProduct" not in plan


def test_datacard_and_group_samplers_are_bounded(spark, sf_dir):
    """corpus_datacard's argmax windows partition by source/cluster;
    sample_k_per_group partitions by the group; temperature mixture is
    broadcast-threshold only. None may plan a partition-less window
    over data rows or a corpus self-join."""
    from twitch_chat_analyser_spark.registry import queries

    for name in (
        "corpus_datacard",
        "sample_k_per_group",
        "sample_temperature_mixture",
    ):
        plan = plan_of(queries()[name](spark, sf_dir))
        assert "CartesianProduct" not in plan, name
        assert not _partitionless_windows(plan), name
        assert "Python" not in plan, name
    # the mixture's only joins are broadcasts (thresholds + the 1-row
    # total); the probe side never shuffles on the threshold key
    mix = plan_of(queries()["sample_temperature_mixture"](spark, sf_dir))
    assert "BroadcastHashJoin" in mix


def test_bloom_probe_broadcasts_the_bit_table(spark, sf_dir):
    """The Bloom probe must be map-side against the broadcast filter —
    never a shuffle of the probe corpus keyed on bit position. r13
    tightened the shape: the filter travels as ONE dense lane-array row
    (no per-position posexplode, no re-aggregation of the K x probes
    stream back to probe grain)."""
    from twitch_chat_analyser_spark.registry import queries

    plan = plan_of(queries()["bloom_ngram_membership"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan  # the exact-hits history join
    assert "posexplode" not in plan
    assert "Python" not in plan


def test_centroid_assignment_no_sort_aggregate(spark, sf_dir):
    """r13: the assignment max_by's buffer carried the v ARRAY, which
    is not hash-aggregable, so every centroid consumer paid
    SortAggregates over the N x C exploded stream (8 in the semdedup
    plan). The map-side fold argmax must leave ZERO SortAggregates —
    and zero Python nodes — in all of them."""
    from twitch_chat_analyser_spark.registry import queries

    qs = queries()
    for name in (
        "dedup_semantic_clusters",
        "ann_ivf_kmeans_topk",
        "curate_prototype_prune",
        "eval_kmeans_purity",
        # the PQ encoder's min_by(struct...) had the same buffer
        # problem — its codebook fold (_pq_encode) is pinned here too
        "ann_pq_topk",
        "ann_ivf_pq_topk",
        "eval_ivf_recall",
    ):
        plan = plan_of(qs[name](spark, sf_dir))
        assert "SortAggregate" not in plan, name
        assert "Python" not in plan, name


def test_weighted_sample_is_take_ordered(spark, sf_dir):
    """A-Res selection is global top-k: TakeOrderedAndProject (merged
    per-partition heaps), not a full sort of the corpus."""
    from twitch_chat_analyser_spark.registry import queries

    plan = plan_of(queries()["sample_weighted_reservoir"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "Python" not in plan


def test_portable_hll_plan_is_jvm_only_with_partial_registers(spark, sf_dir):
    """The portable HLL must keep the DataSketches plan shape: register
    maxima computed as a partial-before-shuffle aggregation over JVM
    expressions only (md5/instr/CASE — no Python nodes), and the tiny
    per-channel join sides broadcast instead of sort-merging."""
    from twitch_chat_analyser_spark.operators import sketches

    df = sketches.portable_hll_chatters(ingest.messages(spark, sf_dir))
    plan = plan_of(df)
    assert "Python" not in plan and "ArrowEval" not in plan
    # register max: partial + final HashAggregate pair around an Exchange
    assert plan.count("HashAggregate") >= 4
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_markov_single_user_exchange_no_python(spark, sf_dir):
    from twitch_chat_analyser_spark.operators import behavior

    df = behavior.markov_transitions(ingest.load(spark, sf_dir, "events"))
    plan = plan_of(df)
    assert "Python" not in plan
    # exactly one window (the per-user lead); its exchange partitions on
    # user_id — the uniform key, never a global sort before the rollup
    assert plan.count("Window") >= 1
    assert "hashpartitioning(user_id" in plan


def test_jaccard_prefix_join_no_cartesian_no_python(spark, sf_dir):
    from twitch_chat_analyser_spark.operators import dedup

    df = dedup.jaccard_threshold_pairs(
        ingest.load(spark, sf_dir, "documents")
    )
    plan = plan_of(df)
    assert "CartesianProduct" not in plan
    assert "Python" not in plan


def test_prototype_prune_broadcasts_codebook_no_global_sort(spark, sf_dir):
    from twitch_chat_analyser_spark.operators import similarity
    from twitch_chat_analyser_spark.operators.llmops import _emb

    df = similarity.prototype_prune(_emb(spark, sf_dir), 8, 2)
    plan = plan_of(df)
    # scoring join against the k-row codebook must broadcast
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    # output is corpus-sized: no presentation sort (rangepartitioning
    # would mark a global sort of the output)
    tail = plan.split("AdaptiveSparkPlan")[0]
    assert "rangepartitioning" not in tail.lower().replace(" ", "")


def test_kmv_overlap_runs_on_sketches_not_facts(spark, sf_dir):
    from twitch_chat_analyser_spark.operators import sketches

    df = sketches.kmv_overlap(ingest.messages(spark, sf_dir))
    plan = plan_of(df)
    assert "Python" not in plan


def test_bigram_lm_no_python_nodes(spark, sf_dir):
    from twitch_chat_analyser_spark.operators import textops

    df = textops.bigram_lm_surprise(ingest.load(spark, sf_dir, "documents"))
    plan = plan_of(df)
    assert "Python" not in plan


def test_ohlc_single_hash_agg_no_window(spark, sf_dir):
    from twitch_chat_analyser_spark.operators import temporal

    df = temporal.ohlc_downsample(ingest.load(spark, sf_dir, "events"))
    plan = plan_of(df)
    # candles build in ONE partial-mergeable hash aggregation — the
    # order statistics ride min_by/max_by, never a window sort. r13:
    # the decimal-packed ordering key is load-bearing — a struct key
    # would silently fall back to SortAggregate (sorts the whole event
    # stream per task), so its absence is pinned too
    assert "Window" not in plan
    assert "SortAggregate" not in plan
    assert "HashAggregate" in plan
    assert "Python" not in plan


def test_latency_percentiles_no_python_and_user_keyed_merge(spark, sf_dir):
    from twitch_chat_analyser_spark.operators import temporal

    df = temporal.purchase_latency_percentiles(
        temporal._events_ms(spark, sf_dir)
    )
    plan = plan_of(df)
    assert "Python" not in plan
    # the as-of core merges on the user key
    assert "hashpartitioning(user_id" in plan


def test_quality_top_fraction_has_single_join(spark, sf_dir):
    """review r12: `source` must ride through quality_score's own
    projection — the old second corpus-sized join back onto docs was a
    whole avoidable shuffle. The only join left is the scorer's internal
    base<->per_doc merge."""
    from twitch_chat_analyser_spark.operators import sampling

    df = sampling.quality_top_fraction(
        ingest.load(spark, sf_dir, "documents")
    )
    # simpleString prints each node ONCE (explain("formatted") repeats
    # every node in the detail section, which double-counts)
    plan = df._jdf.queryExecution().executedPlan().toString()
    n_joins = sum(plan.count(j) for j in (
        "SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
        "BroadcastNestedLoopJoin", "CartesianProduct",
    ))
    assert n_joins == 1, plan


def test_unbounded_vocab_sides_are_not_forced_broadcasts(spark, sf_dir):
    """review r12: tfidf's df table and bpe_encode's symbol table grow
    with the corpus vocabulary — a forced broadcast OOMs the driver at
    scale. The logical plans must carry no join hint on those sides;
    AQE is free to broadcast at runtime when they are actually small."""
    from twitch_chat_analyser_spark.operators import sampling, textops

    docs = ingest.load(spark, sf_dir, "documents")
    # tfidf: its only remaining hint is the legitimate 1-row n_docs
    # broadcast. The vocabulary-sized df join carries NO hint — at test
    # scale the optimizer still picks broadcast from its SIZE estimate
    # (which is the point: size-driven, it flips to a shuffle join when
    # the vocabulary outgrows the threshold; a hint never flips)
    tfidf = sampling.tfidf_top_terms(docs)
    logical = tfidf._jdf.queryExecution().analyzed().toString()
    assert logical.count("ResolvedHint") == 1, logical
    # bpe_encode: no hints at all (the symbol-table join and the
    # in-loop 1-row argmax crossJoins are AQE's call)
    bpe = textops.bpe_encode(docs.limit(50))
    logical = bpe._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in logical, logical
