"""Goldens for the round-5 operator batch: Markov transitions, KMV
set-op sketch, SSL-prototype pruning, bigram-LM surprise, and the
prefix-filtered exact Jaccard join."""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest

from twitch_chat_analyser_spark.operators import (
    behavior,
    dedup,
    similarity,
    sketches,
    textops,
)

TS = "2024-01-01 00:00:{:02d}"


def _events(spark, rows):
    return spark.createDataFrame(
        [(i, ts, u, t, 0.0, "{}") for i, (ts, u, t) in enumerate(rows)],
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))


# ---------------------------------------------------------------- markov


def test_markov_transitions_golden(spark):
    rows = [
        (TS.format(1), 1, "view"),
        (TS.format(2), 1, "click"),
        (TS.format(3), 1, "view"),
        (TS.format(4), 1, "click"),
        (TS.format(1), 2, "view"),
        (TS.format(2), 2, "buy"),
    ]
    out = {
        (r["src_type"], r["dst_type"]): (r["transitions"], r["prob_ppm"])
        for r in behavior.markov_transitions(_events(spark, rows)).collect()
    }
    # user1: view>click, click>view, view>click ; user2: view>buy
    assert out[("view", "click")] == (2, 666667)
    assert out[("view", "buy")] == (1, 333333)
    assert out[("click", "view")] == (1, 1000000)
    assert len(out) == 3


def test_markov_simultaneous_events_tie_break_on_event_id(spark):
    # same-timestamp events order by event_id: 0:view -> 1:click -> 2:buy
    rows = [
        (TS.format(1), 1, "view"),
        (TS.format(1), 1, "click"),
        (TS.format(1), 1, "buy"),
    ]
    out = {
        (r["src_type"], r["dst_type"])
        for r in behavior.markov_transitions(_events(spark, rows)).collect()
    }
    assert out == {("view", "click"), ("click", "buy")}


# ------------------------------------------------------------------- kmv


def _msgs(spark, rows):
    return spark.createDataFrame(
        rows, "ts timestamp, channel string, username string, message string"
    )


def test_kmv_exact_below_k(spark):
    # fewer distinct users than k on both sides -> estimates are EXACT
    rows = []
    for u in range(10):
        rows.append((None, "a", f"user{u}", "m"))
    for u in range(5, 15):  # overlap = 5
        rows.append((None, "b", f"user{u}", "m"))
    out = sketches.kmv_overlap(_msgs(spark, rows), k=64).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["est_a_milli"], r["est_b_milli"]) == (10000, 10000)
    assert r["est_union_milli"] == 15000
    assert r["kmin_overlap"] == 5
    assert r["est_intersection_milli"] == 5000


def test_kmv_estimate_within_error_above_k(spark):
    rows = [(None, "a", f"u{i}", "m") for i in range(2000)]
    rows += [(None, "b", f"u{i}", "m") for i in range(1000, 3000)]
    out = sketches.kmv_overlap(_msgs(spark, rows), k=64).collect()[0]
    # sigma ~ 1/sqrt(k) = 12.5%; allow 4 sigma
    assert abs(out["est_a_milli"] / 1000 - 2000) / 2000 < 0.5
    assert abs(out["est_union_milli"] / 1000 - 3000) / 3000 < 0.5
    assert abs(out["est_intersection_milli"] / 1000 - 1000) / 1000 < 0.75


def test_kmv_hash_is_60_bit_non_negative(spark):
    df = _msgs(spark, [(None, "c", f"u{i}", "m") for i in range(50)])
    vals = [
        r["hv"] for r in sketches.kmv_kmin(df, k=64).select("hv").collect()
    ]
    assert all(0 <= v < (1 << 60) for v in vals)
    assert len(set(vals)) == 50  # distinct users -> distinct hashes


# ------------------------------------------------------- prototype prune


def _emb(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v], 0) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>, label int",
    )


def test_prototype_prune_drops_most_prototypical(spark):
    # two tight clusters around the first two vectors (the k=2 init);
    # within each cluster the vector NEAREST the centroid must be the
    # pruned one at prune_fraction high enough to cut one per cluster
    c1 = [[1.0, 0.0], [0.99, 0.01], [0.9, 0.1], [0.8, 0.2]]
    c2 = [[0.0, 1.0], [0.01, 0.99], [0.1, 0.9], [0.2, 0.8]]
    out = similarity.prototype_prune(
        _emb(spark, c1 + c2), k=2, iterations=2, prune_fraction=0.25
    ).collect()
    by_id = {r["vec_id"]: r for r in out}
    assert len(out) == 8
    # every cluster has 4 members -> floor(4 * 0.25) = 1 pruned each
    pruned = [r["vec_id"] for r in out if not r["kept"]]
    assert len(pruned) == 2
    # pruned members are rank 1 (most prototypical)
    for vid in pruned:
        assert by_id[vid]["proto_rank"] == 1
    # ranks within each cluster are a permutation of 1..4
    for cid in {r["centroid_id"] for r in out}:
        ranks = sorted(
            r["proto_rank"] for r in out if r["centroid_id"] == cid
        )
        assert ranks == [1, 2, 3, 4]


# ----------------------------------------------------------- bigram LM


def _docs(spark, texts, langs=None):
    return spark.createDataFrame(
        [
            (i, t, (langs or {}).get(i, "en"), "src0", len(t))
            for i, t in enumerate(texts)
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_bigram_lm_separates_predictable_from_shuffled(spark):
    # a corpus dominated by one repeated sentence: in-pattern docs score
    # near the max; a doc with the same words in unseen order scores
    # lower. ("the ... of ..." keeps >= 2 distinct stopwords so the
    # docs pass the Gopher rules and actually train the model.)
    base = "the quick fox of the barn jumps over the lazy dog " * 4
    docs = [base.strip()] * 6 + [
        "dog the over of fox quick lazy jumps barn the"
    ]
    out = textops.bigram_lm_surprise(_docs(spark, docs)).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[0]["n_bigrams"] > 0
    in_pattern = by_id[0]["lm_logprob_micro"] / by_id[0]["n_bigrams"]
    shuffled = by_id[6]["lm_logprob_micro"] / by_id[6]["n_bigrams"]
    assert in_pattern > shuffled
    assert by_id[6]["n_bigrams"] == 9


def test_bigram_lm_short_doc_has_zero_bigrams_and_fails(spark):
    out = textops.bigram_lm_surprise(
        _docs(spark, ["solo", "two words here okay fine sure yes no"])
    ).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[0]["n_bigrams"] == 0
    assert by_id[0]["lm_pass"] is False


def test_bigram_laplace_math_matches_formula(spark):
    # tiny corpus, hand-checked: train = the single rules-passing doc is
    # impossible at this size (rules need >= 40 words), so the model is
    # EMPTY -> v clamps to 1 and every bigram scores ln(1/1) = 0
    out = textops.bigram_lm_surprise(_docs(spark, ["a b a b"])).collect()[0]
    assert out["lm_logprob_micro"] == 0
    assert out["n_bigrams"] == 3


# ------------------------------------------------------- jaccard prefix


def test_jaccard_prefix_join_exact_vs_brute_force(spark):
    texts = [
        "a b c d e",
        "a b c d f",      # J with 0: 4/6 = 0.667
        "a b c d e",      # J with 0: 1.0
        "x y z w q",
        "a x c d e",      # J with 0: 4/6
    ]
    docs = _docs(spark, texts)
    out = dedup.jaccard_threshold_pairs(docs, threshold=0.6).collect()
    got = {(r["doc_a"], r["doc_b"]): r["jaccard_ppm"] for r in out}
    # brute force in python (exact round-half-up ppm, integer math)
    sets = [set(t.split()) for t in texts]
    want = {}
    for i in range(len(sets)):
        for j in range(i + 1, len(sets)):
            inter = len(sets[i] & sets[j])
            union = len(sets[i] | sets[j])
            if inter / union >= 0.6:
                want[(i, j)] = (2_000_000 * inter + union) // (2 * union)
    assert got == want
    r0 = {(r["doc_a"], r["doc_b"]): r for r in out}[(0, 2)]
    assert (r0["inter_tokens"], r0["size_a"], r0["size_b"]) == (5, 5, 5)


def test_jaccard_prefix_join_near_miss_excluded(spark):
    # J = 3/5 = 0.6 < 0.9: must not appear even though prefixes collide
    docs = _docs(spark, ["a b c d", "a b c e"])
    assert dedup.jaccard_threshold_pairs(docs, threshold=0.9).count() == 0


def test_jaccard_prefix_filter_completeness_random(spark):
    # randomized-ish (deterministic seeds) cross-check vs brute force
    import random

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(30)]
    texts = [
        " ".join(rng.sample(vocab, rng.randint(5, 12))) for _ in range(40)
    ]
    docs = _docs(spark, texts)
    out = dedup.jaccard_threshold_pairs(docs, threshold=0.5).collect()
    got = {(r["doc_a"], r["doc_b"]) for r in out}
    sets = [set(t.split()) for t in texts]
    want = set()
    for i in range(len(sets)):
        for j in range(i + 1, len(sets)):
            if len(sets[i] & sets[j]) / len(sets[i] | sets[j]) >= 0.5:
                want.add((i, j))
    assert got == want


# ----------------------------------------------------------------- kcore


def test_kcore_peels_chain_keeps_clique(spark):
    from twitch_chat_analyser_spark.operators import graph
    import pyspark.sql.functions as F

    # K4 clique (0-3) with a pendant chain 3-10-11: 2-core = the clique
    edges = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    edges += [(3, 10), (10, 11)]
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = graph.kcore(df, k=2).collect()
    out = {r["node"]: r["core_degree"] for r in rows}
    assert out == {0: 3, 1: 3, 2: 3, 3: 3}
    assert all(r["converged"] for r in rows)


def test_kcore_converged_flag_false_when_budget_too_small(spark):
    from twitch_chat_analyser_spark.operators import graph

    # a 6-node path peels one node per END per round; rounds=1 leaves a
    # partially-peeled superset whose next peel would still drop edges
    edges = [(i, i + 1) for i in range(6)]
    df = spark.createDataFrame(edges, "src long, dst long")
    short = graph.kcore(df, k=2, rounds=1).collect()
    assert short  # superset still reported ...
    assert all(r["converged"] is False for r in short)  # ... but labeled
    full = graph.kcore(df, k=2, rounds=6).collect()
    # a pure path has no 2-core: fixpoint is empty, flag has no rows to
    # ride on — emptiness itself is the converged answer here
    assert full == []


def test_kcore_both_paths_agree(spark):
    """The adaptive small-graph (driver peel) and distributed
    (aggregate + semi-joins per round) paths produce identical
    (node, core_degree, converged) rows — including on a budget too
    small to converge (r13 driver escape)."""
    from twitch_chat_analyser_spark.operators import graph

    # K4 clique + pendant chain + separate triangle + pure path
    edges = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    edges += [(3, 10), (10, 11), (20, 21), (21, 22), (20, 22)]
    edges += [(30, 31), (31, 32), (32, 33)]
    df = spark.createDataFrame(edges, "src long, dst long")
    for rounds in (1, 6):
        fast = sorted(
            (r["node"], r["core_degree"], r["converged"])
            for r in graph.kcore(df, k=2, rounds=rounds).collect()
        )
        dist = sorted(
            (r["node"], r["core_degree"], r["converged"])
            for r in graph.kcore(
                df, k=2, rounds=rounds, small_graph_edges=0
            ).collect()
        )
        assert fast == dist, rounds


def test_kcore_gate_rounds_reach_fixpoint(spark, sf_dir):
    # the committed round budget must be a true fixpoint on gate data:
    # one extra round changes nothing
    from twitch_chat_analyser_spark import ingest
    from twitch_chat_analyser_spark.operators import dedup, graph, llmops
    import pyspark.sql.functions as F

    docs = ingest.load(spark, sf_dir, "documents")
    pairs = dedup.minhash_dedup_pairs(
        docs, llmops.NUM_HASHES, llmops.SHINGLE_K,
        llmops.MINHASH_JACCARD_THRESHOLD, sort=False,
    )
    e = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    e = e.localCheckpoint()
    a = {(r["node"], r["core_degree"])
         for r in graph.kcore(e, rounds=graph.KCORE_ROUNDS).collect()}
    b = {(r["node"], r["core_degree"])
         for r in graph.kcore(e, rounds=graph.KCORE_ROUNDS + 1).collect()}
    assert a == b


def test_jaccard_block_cap_bounds_candidates_keeps_connectivity(spark):
    # 60 identical docs: exact path emits all C(60,2)=1770 pairs; the
    # capped path emits only pivot pairs (~cap*N) but every doc still
    # pairs with the bucket pivots, so the dup CLUSTER stays connected
    texts = ["alpha beta gamma delta epsilon"] * 60
    docs = _docs(spark, texts)
    exact = dedup.jaccard_threshold_pairs(docs, threshold=0.9)
    capped = dedup.jaccard_threshold_pairs(docs, threshold=0.9, block_cap=4)
    n_exact, n_capped = exact.count(), capped.count()
    assert n_exact == 60 * 59 // 2
    # pivots = 4 lowest ids: pairs = C(4,2) + 4*(60-4) = 6 + 224
    assert n_capped == 6 + 4 * 56
    # connectivity: every doc appears in >= 1 capped pair
    rows = capped.collect()
    nodes = {r["doc_a"] for r in rows} | {r["doc_b"] for r in rows}
    assert nodes == set(range(60))


# ------------------------------------------------------ ohlc / winsorize


def test_ohlc_golden_order_dependence(spark):
    rows = [
        (TS.format(1), 1, "view"),   # event 0: first in bucket
        (TS.format(30), 1, "view"),  # event 1: last in bucket
        (TS.format(15), 2, "view"),  # event 2: middle (max value)
    ]
    ev = _events(spark, rows)
    ev = ev.withColumn(
        "value",
        F.when(F.col("event_id") == 0, 10.0)
        .when(F.col("event_id") == 1, 20.0)
        .otherwise(99.0),
    )
    from twitch_chat_analyser_spark.operators import temporal

    out = temporal.ohlc_downsample(ev).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["open"], r["high"], r["low"], r["close"], r["n_events"]) == (
        10.0, 99.0, 10.0, 20.0, 3,
    )


def test_ohlc_same_ms_ties_break_on_event_id(spark):
    rows = [(TS.format(1), 1, "view")] * 3
    ev = _events(spark, rows).withColumn(
        "value", F.col("event_id").cast("double")
    )
    from twitch_chat_analyser_spark.operators import temporal

    r = temporal.ohlc_downsample(ev).collect()[0]
    assert (r["open"], r["close"]) == (0.0, 2.0)


def test_winsorize_clips_both_tails(spark):
    rows = [(TS.format(i % 60), 1, "view") for i in range(100)]
    ev = _events(spark, rows).withColumn(
        "value", F.col("event_id").cast("double")
    )
    from twitch_chat_analyser_spark.operators import temporal

    out = {r["event_id"]: r["value_winsorized"]
           for r in temporal.winsorize_values(ev).collect()}
    # p05 = value at rank ceil(0.05*100)=5 -> 4.0; p95 -> rank 95 -> 94.0
    assert out[0] == 4.0 and out[2] == 4.0
    assert out[99] == 94.0 and out[97] == 94.0
    assert out[50] == 50.0  # middle untouched


# -------------------------------------------- source divergence / board


def test_source_divergence_uniform_source_has_zero_kl(spark):
    # both sources drawn identically -> p_s == q -> KL exactly 0
    texts = ["aa bb cc dd", "aa bb cc dd"]
    rows = [
        (0, texts[0], "en", "s0", 11),
        (1, texts[1], "en", "s1", 11),
    ]
    docs = spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = {r["source"]: r for r in textops.source_divergence(docs).collect()}
    assert out["s0"]["kl_nano"] == 0 and out["s1"]["kl_nano"] == 0
    # entropy of 4 equiprobable tokens = ln(4), in nano-nats
    assert abs(out["s0"]["entropy_nano"] / 1e9 - math.log(4)) < 1e-6


def test_source_divergence_skewed_source_positive_kl(spark):
    rows = [
        (0, "aa aa aa aa aa aa aa aa", "en", "skew", 23),
        (1, "aa bb cc dd ee ff gg hh", "en", "mix", 23),
    ]
    docs = spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = {r["source"]: r for r in textops.source_divergence(docs).collect()}
    assert out["skew"]["kl_nano"] > 200_000_000
    assert out["skew"]["entropy_nano"] == 0  # single token type
    assert out["mix"]["n_distinct"] == 8


def test_curation_scoreboard_composition(spark, sf_dir):
    from twitch_chat_analyser_spark import ingest
    from twitch_chat_analyser_spark.operators.llmops import (
        _q_curation_scoreboard,
    )

    out = _q_curation_scoreboard(spark, sf_dir).collect()
    docs_n = ingest.load(spark, sf_dir, "documents").count()
    assert len(out) == docs_n
    for r in out:
        n = int(r["rules_pass"]) + int(r["nb_pass"]) + int(r["lm_pass"])
        assert r["n_pass"] == n
        assert r["keep"] == (n == 3)


def test_hard_negatives_exclude_same_label_and_rank_by_cos(spark):
    # labels: 0 for first 4 vecs, 1 for rest; query 0's nearest SAME-
    # label vec must be absent, nearest DIFFERENT-label vec is rank 1
    vecs = [
        ([1.0, 0.0], 0),          # query
        ([0.999, 0.01], 0),       # nearest overall but same label
        ([0.9, 0.1], 1),          # nearest hard negative
        ([0.0, 1.0], 1),
        ([-1.0, 0.0], 1),
    ]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v], l) for i, (v, l) in enumerate(vecs)],
        "vec_id long, embedding array<float>, label int",
    )
    out = similarity.hard_negative_topk(df, [0], k=2).collect()
    ids = [(r["rank"], r["neighbor_id"], r["neighbor_label"]) for r in out]
    assert ids == [(1, 2, 1), (2, 3, 1)]
    assert all(r["neighbor_label"] != 0 for r in out)


def test_purchase_latency_percentiles_golden(spark):
    from twitch_chat_analyser_spark.operators import temporal

    # same hour: 10 purchases, each 1..10 minutes after the user's click
    rows = []
    eid = 0
    for u in range(10):
        rows.append((eid, f"2024-01-01 09:0{0}:00", u, "click"))
        eid += 1
        rows.append((eid, f"2024-01-01 09:{u + 1:02d}:00", u, "purchase"))
        eid += 1
    ev = spark.createDataFrame(
        [(i, ts, u, t) for i, ts, u, t in rows],
        "event_id long, ts string, user_id long, event_type string",
    )
    ev = ev.select(
        "event_id", "user_id", "event_type",
        F.unix_millis(F.to_timestamp("ts")).alias("ms"),
    )
    out = temporal.purchase_latency_percentiles(ev).collect()
    assert len(out) == 1
    r = out[0]
    assert r["hour_of_day"] == 9 and r["n_purchases"] == 10
    # lags are 1..10 min; rank ceil(0.5*10)=5 -> 5 min, ceil(0.9*10)=9
    assert r["p50_lag_ms"] == 5 * 60_000
    assert r["p90_lag_ms"] == 9 * 60_000
