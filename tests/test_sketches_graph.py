"""HLL sketch merge correctness (exact at test cardinalities) and
connected-components goldens."""

from __future__ import annotations

from pyspark.sql import functions as F

from twitch_chat_analyser_spark.operators import graph, sketches


def test_sketch_merge_equals_exact_distinct(spark, sf_dir):
    from twitch_chat_analyser_spark import ingest

    msgs = ingest.messages(spark, sf_dir)
    got = {
        r["channel"]: r["distinct_chatters"]
        for r in sketches.channel_chatters_via_sketch_merge(msgs).collect()
    }
    exact = {
        r["channel"]: r["n"]
        for r in msgs.groupBy("channel")
        .agg(F.countDistinct("username").alias("n"))
        .collect()
    }
    # HLL sketches are exact in sparse mode, far beyond test cardinality
    assert got == exact


def test_sketch_reaggregation_beats_resummed_daily_counts(spark):
    # one user active on two days: daily counts SUM to 2, the sketch
    # union correctly reports 1 — the measure is not additive
    rows = [(0, "c", "u"), (sketches.DAY_MS + 1, "c", "u")]
    msgs = spark.createDataFrame(
        rows, "timestamp long, channel string, username string"
    )
    daily = sketches.daily_chatter_sketches(msgs)
    assert daily.agg(F.sum("daily_chatters")).first()[0] == 2
    assert sketches.merge_chatters(daily, ["channel"]).first()[
        "distinct_chatters"
    ] == 1


def test_approx_percentile_bounded_at_test_scale(spark, sf_dir):
    from twitch_chat_analyser_spark import ingest

    rows = {
        r["o_orderpriority"]: r
        for r in sketches.order_value_digests(spark, sf_dir).collect()
    }
    # the emitted stats are exact single-pass group aggregates; the
    # in-plan booleans assert the approx_percentile estimate's EXACT
    # rank (two conditional sums) lands within its documented
    # guarantee p·n ± (2n/a + 1) — round 9: the prior rank-ceil truth
    # was five near-global sorts, the registry's one scale-killer
    orders = ingest.load(spark, sf_dir, "orders")
    truth = {
        r["o_orderpriority"]: r
        for r in orders.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
        .collect()
    }
    for k, r in rows.items():
        t = truth[k]
        assert (r["n_orders"], r["price_min"], r["price_max"]) == (
            t["n"], t["lo"], t["hi"]
        )
        assert r["within_bound_50"] and r["within_bound_90"]


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_connected_components_golden(spark):
    # two components {1,2,3,4} (chain) and {10,11}; 20 isolated (absent)
    comp = {
        r["node"]: r["component"]
        for r in graph.connected_components(
            _edges(spark, [(1, 2), (2, 3), (3, 4), (10, 11)])
        ).collect()
    }
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_dedup_clusters_singletons_survive(spark):
    docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    pairs = spark.createDataFrame(
        [(0, 3), (3, 5)], "doc_a long, doc_b long"
    )
    out = {r["doc_id"]: (r["cluster_id"], r["is_survivor"])
           for r in graph.dedup_clusters(docs, pairs).collect()}
    assert out[0] == (0, True) and out[3] == (0, False) and out[5] == (0, False)
    assert out[1] == (1, True) and out[2] == (2, True) and out[4] == (4, True)


def test_triangle_counts_known_graph(spark):
    # K4 on {1,2,3,4} minus edge (3,4): triangles {1,2,3} and {1,2,4};
    # node 5-6 edge forms no triangle
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (5, 6)],
        "src long, dst long",
    )
    out = {r["node"]: r["triangles"] for r in graph.triangle_counts(edges).collect()}
    assert out == {1: 2, 2: 2, 3: 1, 4: 1}


def test_cluster_representatives_keep_best(spark):
    # cluster {0,3,5}: doc 5 has the best quality -> kept over min-id 0;
    # cluster {7,8}: tie on quality -> lowest doc_id (7) wins;
    # singletons (1) never emitted
    docs = spark.createDataFrame(
        [(i,) for i in (0, 1, 3, 5, 7, 8)], "doc_id long"
    )
    pairs = spark.createDataFrame(
        [(0, 3), (3, 5), (7, 8)], "doc_a long, doc_b long"
    )
    quality = spark.createDataFrame(
        [(0, 0.2), (1, 0.9), (3, 0.5), (5, 0.8), (7, 0.4), (8, 0.4)],
        "doc_id long, quality_score double",
    )
    out = {
        r["cluster_id"]: r
        for r in graph.cluster_representatives(docs, pairs, quality).collect()
    }
    assert set(out) == {0, 7}
    assert (out[0]["rep_doc_id"], out[0]["cluster_size"]) == (5, 3)
    assert out[0]["rep_quality"] == 0.8
    assert (out[7]["rep_doc_id"], out[7]["cluster_size"]) == (7, 2)


def test_connected_components_both_paths_agree(spark):
    # the adaptive small-graph (driver union-find) and distributed
    # (label propagation) paths must produce identical min-label
    # components on a mix of chains, stars, and singles
    pairs = (
        [(i, i + 1) for i in range(0, 20)]  # one long chain 0..20
        + [(100, x) for x in range(101, 110)]  # a star
        + [(200, 201), (300, 301), (301, 302)]
    )
    fast = {
        r["node"]: r["component"]
        for r in graph.connected_components(_edges(spark, pairs)).collect()
    }
    dist = {
        r["node"]: r["component"]
        for r in graph.connected_components(
            _edges(spark, pairs), small_graph_edges=0
        ).collect()
    }
    assert fast == dist
    assert fast[20] == 0 and fast[109] == 100 and fast[302] == 300


def test_connected_components_warns_when_not_converged(spark):
    """Review r10: exhausting max_iter used to return silently with
    possibly-fragmented components; it must warn."""
    import warnings

    pairs = [(i, i + 1) for i in range(0, 12)]  # chain needs >1 round
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        graph.connected_components(
            _edges(spark, pairs), max_iter=1, small_graph_edges=0
        ).collect()
    assert any("did not converge" in str(x.message) for x in w)
    # a converged run stays silent
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        graph.connected_components(
            _edges(spark, pairs), small_graph_edges=0
        ).collect()
    assert not any("did not converge" in str(x.message) for x in w)


def test_pagerank_matches_power_iteration(spark):
    """DataFrame PageRank equals a dense power-iteration reference on a
    hand-built graph (same simplified dangling handling)."""
    from twitch_chat_analyser_spark.operators.graph import pagerank

    edges = [("a", "b"), ("b", "a"), ("a", "c"), ("c", "b"), ("d", "a")]
    e = spark.createDataFrame(edges, "src string, dst string")
    got = {r.node: r.rank for r in pagerank(e, iterations=25).collect()}

    nodes = sorted({x for p in edges for x in p})
    idx = {n: i for i, n in enumerate(nodes)}
    out_deg = {n: sum(1 for s, _ in edges if s == n) for n in nodes}
    import numpy as np

    M = np.zeros((len(nodes), len(nodes)))
    for s, d in edges:
        M[idx[d], idx[s]] = 1.0 / out_deg[s]
    r = np.full(len(nodes), 1.0 / len(nodes))
    for _ in range(25):
        r = 0.15 / len(nodes) + 0.85 * (M @ r)
    for n in nodes:
        assert abs(got[n] - r[idx[n]]) < 1e-9, n
    # hub ordering: 'a' and 'b' (mutually linked, extra in-edges) beat
    # 'd' (no in-links, floor rank only)
    assert got["a"] > got["d"] and got["b"] > got["d"]


def test_pagerank_both_paths_agree(spark):
    """The adaptive small-graph (driver loop) and distributed
    (join + agg per round) paths compute the same ranks."""
    from twitch_chat_analyser_spark.operators.graph import pagerank

    edges = [("a", "b"), ("b", "a"), ("a", "c"), ("c", "b"), ("d", "a")]
    e = spark.createDataFrame(edges, "src string, dst string")
    fast = {r.node: r.rank for r in pagerank(e, iterations=10).collect()}
    dist = {
        r.node: r.rank
        for r in pagerank(e, iterations=10, small_graph_edges=0).collect()
    }
    assert set(fast) == set(dist)
    for n in fast:
        assert abs(fast[n] - dist[n]) < 1e-12, n


def test_pagerank_rank_order_on_testdata(spark, sf_dir):
    from twitch_chat_analyser_spark.registry import queries

    out = queries()["channel_pagerank"](spark, sf_dir).collect()
    assert len(out) >= 2
    ranks = [r.rank for r in out]
    assert ranks == sorted(ranks, reverse=True)
    assert all(r > 0 for r in ranks)


def _chatters(spark, spec: dict[str, int]):
    """channel -> n distinct users, 3 messages each (duplicates must not
    move the estimate)."""
    rows = [
        (c, f"u{c}_{i}")
        for c, n in spec.items()
        for i in range(n)
        for _ in range(3)
    ]
    return spark.createDataFrame(rows, "channel string, username string")


def test_portable_hll_small_range_is_near_exact(spark):
    """Linear-counting regime (n << m=256): the embedded-ln correction
    lands within a fraction of a count."""
    out = {
        r["channel"]: r
        for r in sketches.portable_hll_chatters(
            _chatters(spark, {"a": 30, "b": 40})
        ).collect()
    }
    assert out["a"]["exact_chatters"] == 30
    # register collisions under-count slightly (expected ~n^2/2m); a few
    # counts of slack covers the deterministic hash draw
    assert abs(out["a"]["hll_est"] - 30) < 4
    assert abs(out["b"]["hll_est"] - 40) < 5


def test_portable_hll_raw_regime_within_sketch_error(spark):
    """Above 2.5m the raw harmonic estimator applies; standard error is
    ~1.04/sqrt(256) = 6.5%, assert a conservative 3-sigma bound."""
    out = sketches.portable_hll_chatters(
        _chatters(spark, {"big": 3000})
    ).collect()[0]
    assert out["exact_chatters"] == 3000
    assert abs(out["hll_est"] - 3000) / 3000 < 0.20


def test_portable_hll_invariant_to_partitioning_and_duplicates(spark):
    """Register max + integer-scaled sum are order- and
    partitioning-free: any layout of the same multiset must produce the
    IDENTICAL rounded estimate (the property the hash-match oracle
    depends on)."""
    base = _chatters(spark, {"a": 120})
    est = lambda df: sketches.portable_hll_chatters(df).collect()[0]["hll_est"]
    e1 = est(base.repartition(17))
    e2 = est(base.coalesce(1))
    e3 = est(base.unionByName(base))  # more duplicates, same distinct set
    assert e1 == e2 == e3


def test_portable_hll_ignores_null_usernames(spark):
    """A NULL hash input must not create a NULL register group — it
    would inflate n_regs without contributing to s_hit and skew (or,
    with all 256 registers hit, break) the estimate (ADVICE r04)."""
    base = _chatters(spark, {"a": 40})
    with_nulls = base.unionByName(
        spark.createDataFrame(
            [("a", None)] * 7, "channel string, username string"
        )
    )
    est = lambda df: sketches.portable_hll_chatters(df).collect()[0]["hll_est"]
    assert est(with_nulls) == est(base)
    regs = sketches.hll_registers(with_nulls)
    assert regs.filter("reg IS NULL").count() == 0


def test_portable_hll_estimate_is_bit_identical_to_duckdb(spark):
    """Adversarial cross-engine parity sweep (review r12): the portable
    HLL's whole promise is that DuckDB reproduces the ESTIMATE
    bit-for-bit from the same SQL fragments. Sweep both regimes
    (small-range correction and raw harmonic) over adversarial
    usernames — NULLs (review r12 found the registry oracle's regs CTE
    missing the NULL filter the Spark side applies), empty strings,
    unicode, near-collisions — and assert the rounded estimates match
    exactly."""
    import duckdb

    rows = []
    # raw regime: ~1500 distinct users in one channel
    rows += [("big", f"user_{i}") for i in range(1500)]
    # small-range regime: 30 distinct
    rows += [("small", f"u{i}") for i in range(30)]
    # adversarial: empty string, unicode, whitespace, hash-ish names
    rows += [
        ("small", ""), ("small", " "), ("small", "ü🎮"),
        ("small", "0" * 32), ("small", "user_1\n"),
    ]
    # NULLs in both channels (must be invisible to the estimate)
    nulls = [("big", None)] * 5 + [("small", None)] * 3
    df = spark.createDataFrame(
        rows + nulls, "channel string, username string"
    )
    got = {
        r["channel"]: r["hll_est"]
        for r in sketches.hll_estimate(sketches.hll_registers(df)).collect()
    }

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE messages(channel VARCHAR, username VARCHAR)"
    )
    con.executemany(
        "INSERT INTO messages VALUES (?, ?)", rows + nulls
    )
    m, scale = sketches.HLL_M, sketches.HLL_SCALE
    sql = f"""
WITH regs AS (
    SELECT channel, {sketches._HLL_REG} AS reg,
           max({sketches._HLL_RHO}) AS mrho
    FROM messages WHERE username IS NOT NULL GROUP BY 1, 2
),
per AS (
    SELECT channel, CAST(count(*) AS BIGINT) AS n_regs,
           CAST(sum({scale} >> mrho) AS BIGINT) AS s_hit
    FROM regs GROUP BY channel
),
est AS (
    SELECT channel, n_regs,
           {sketches.HLL_ALPHA} * {sketches.HLL_NUMER!r}
             / CAST(s_hit + ({m} - n_regs) * {scale} AS DOUBLE) AS raw
    FROM per
)
SELECT channel,
       round(CASE WHEN raw <= {2.5 * m!r} AND ({m} - n_regs) > 0
             THEN {float(m)!r} * list_extract(
                 [{', '.join(repr(x) for x in sketches.HLL_LN_TABLE)}],
                 {m} - n_regs)
             ELSE raw END, 2) AS hll_est
FROM est"""
    want = {ch: est for ch, est in con.execute(sql).fetchall()}
    assert got == want
    # regime sanity: the sweep really covered both branches
    assert got["small"] <= 2.5 * m  # small-range corrected
    assert got["big"] > 2.5 * m  # raw harmonic estimator


def test_portable_kmv_estimates_are_bit_identical_to_duckdb(spark):
    """Same adversarial cross-engine sweep for the KMV set-operation
    estimates: both capped (>k distinct) and uncapped (<k) channels,
    controlled overlap, NULLs and unicode."""
    import duckdb

    rows = []
    rows += [("x", f"shared_{i}") for i in range(200)]
    rows += [("y", f"shared_{i}") for i in range(100)]  # half overlap
    rows += [("y", f"only_y_{i}") for i in range(150)]
    rows += [("z", f"tiny_{i}") for i in range(9)]  # uncapped side
    rows += [("z", "ü🎮"), ("x", ""), ("y", "0" * 32)]
    nulls = [("x", None), ("z", None)]
    df = spark.createDataFrame(
        rows + nulls, "channel string, username string"
    )
    got = sorted(
        map(tuple, sketches.kmv_overlap(df).drop("kmin_overlap").collect())
    )

    con = duckdb.connect()
    con.execute("CREATE TABLE messages(channel VARCHAR, username VARCHAR)")
    con.executemany("INSERT INTO messages VALUES (?, ?)", rows + nulls)
    k, numer = sketches.KMV_K, sketches.KMV_NUMER
    sql = f"""
WITH hv AS (
    SELECT DISTINCT channel, {sketches._KMV_HASH} AS hv
    FROM messages WHERE username IS NOT NULL
),
sk AS (
    SELECT channel, hv FROM (
        SELECT channel, hv,
               row_number() OVER (PARTITION BY channel ORDER BY hv) AS r
        FROM hv
    ) WHERE r <= {k}
),
per AS (
    SELECT channel,
           CASE WHEN count(*) < {k} THEN CAST(count(*) AS DOUBLE)
                ELSE {numer!r} / CAST(max(hv) AS DOUBLE) END AS est
    FROM sk GROUP BY channel
),
pairs AS (
    SELECT a.channel AS channel_a, b.channel AS channel_b,
           a.est AS est_a_raw, b.est AS est_b_raw
    FROM per a, per b WHERE a.channel < b.channel
),
u AS (
    SELECT channel_a, channel_b, hv, max(ia) AS ia, max(ib) AS ib FROM (
        SELECT p.channel_a, p.channel_b, s.hv, 1 AS ia, 0 AS ib
        FROM pairs p JOIN sk s ON s.channel = p.channel_a
        UNION ALL
        SELECT p.channel_a, p.channel_b, s.hv, 0 AS ia, 1 AS ib
        FROM pairs p JOIN sk s ON s.channel = p.channel_b
    ) GROUP BY 1, 2, 3
),
uk AS (
    SELECT * FROM (
        SELECT *, row_number() OVER (
            PARTITION BY channel_a, channel_b ORDER BY hv) AS r
        FROM u
    ) WHERE r <= {k}
),
pu AS (
    SELECT channel_a, channel_b, count(*) AS un, max(hv) AS hku,
           CAST(sum(CASE WHEN ia = 1 AND ib = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS overlap
    FROM uk GROUP BY 1, 2
)
SELECT p.channel_a, p.channel_b,
       CAST(round(p.est_a_raw * 1000, 0) AS BIGINT) AS est_a_milli,
       CAST(round(p.est_b_raw * 1000, 0) AS BIGINT) AS est_b_milli,
       CAST(round((CASE WHEN pu.un < {k} THEN CAST(pu.un AS DOUBLE)
                  ELSE {numer!r} / CAST(pu.hku AS DOUBLE) END)
                  * 1000, 0) AS BIGINT) AS est_union_milli,
       CAST(round(CAST(pu.overlap AS DOUBLE) / CAST(pu.un AS DOUBLE)
             * (CASE WHEN pu.un < {k} THEN CAST(pu.un AS DOUBLE)
                     ELSE {numer!r} / CAST(pu.hku AS DOUBLE) END)
             * 1000, 0) AS BIGINT) AS est_intersection_milli
FROM pairs p JOIN pu USING (channel_a, channel_b)
ORDER BY channel_a, channel_b"""
    want = sorted(map(tuple, con.execute(sql).fetchall()))
    assert got == want
    # the uncapped channel z really exercised the exact branch
    assert any(
        a == "x" and b == "z" or a == "z" for a, b, *_ in got
    )
