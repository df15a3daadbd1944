"""Edge-behavior tests for the sampling and window-analytics operators
(the oracle covers the bulk math at sf0.01; these cover determinism and
boundary semantics on hand-built data)."""

from __future__ import annotations

from pyspark.sql import functions as F

from twitch_chat_analyser_spark.operators import analytics, sampling


def _docs(spark, n=400):
    return spark.createDataFrame(
        [(i, "en" if i % 2 else "de", "web", f"text {i}") for i in range(n)],
        "doc_id long, lang string, source string, text string",
    )


def test_split_is_deterministic_and_total(spark):
    docs = _docs(spark)
    a = {r["doc_id"]: r["split"] for r in sampling.train_test_split(docs).collect()}
    b = {r["doc_id"]: r["split"] for r in sampling.train_test_split(docs).collect()}
    assert a == b and len(a) == 400
    # hash split should land in the right ballpark (it's exact-in-
    # expectation over the id space, not a per-run RNG draw)
    train = sum(1 for v in a.values() if v == "train")
    assert 0.7 * 400 < train < 0.9 * 400


def test_keep_all_and_keep_none_fractions(spark):
    """Review r10: fraction >= 1 used to format as the 5-char '10000',
    which string-compares below most 4-char hex prefixes and silently
    kept ~6 % of rows instead of all of them."""
    assert sampling.hash_threshold(1.0) == "g"
    assert sampling.hash_threshold(-0.5) == "0000"
    docs = _docs(spark, 100)
    assert sampling.deterministic_sample(docs, 1.0).count() == 100
    assert sampling.deterministic_sample(docs, 0.0).count() == 0
    splits = {
        r["split"] for r in sampling.train_test_split(docs, 1.0).collect()
    }
    assert splits == {"train"}


def test_sample_is_subset_and_stable_under_corpus_growth(spark):
    small = sampling.deterministic_sample(_docs(spark, 200), 0.25)
    big = sampling.deterministic_sample(_docs(spark, 400), 0.25)
    small_ids = {r["doc_id"] for r in small.collect()}
    big_ids = {r["doc_id"] for r in big.collect()}
    # membership of existing rows never changes when the corpus grows
    assert small_ids == {i for i in big_ids if i < 200}


def test_stratified_quota_per_group(spark):
    out = sampling.stratified_sample(_docs(spark), per_group=10).collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r["lang"], set()).add(r["doc_id"])
    assert {len(v) for v in by_lang.values()} == {10}
    assert set(by_lang) == {"en", "de"}


def test_window_deltas_first_row_null_and_moving_sum(spark):
    fact = spark.createDataFrame(
        [("a", 1000, 5), ("a", 2000, 8), ("a", 3000, 2), ("b", 1000, 7)],
        "channel string, timestamp long, messages long",
    )
    rows = {
        (r["channel"], r["timestamp"]): (r["delta"], r["moving_sum"])
        for r in analytics.window_deltas(fact, ["channel"], "messages").collect()
    }
    assert rows[("a", 1000)] == (None, 5)
    assert rows[("a", 2000)] == (3, 13)
    assert rows[("a", 3000)] == (-6, 15)
    assert rows[("b", 1000)] == (None, 7)


def test_cooccurrence_jaccard_golden(spark):
    msgs = spark.createDataFrame(
        [("x", "u1"), ("x", "u2"), ("x", "u3"), ("y", "u2"), ("y", "u3"), ("y", "u4")],
        "channel string, username string",
    )
    [r] = analytics.channel_cooccurrence(msgs).collect()
    assert (r["channel_a"], r["channel_b"]) == ("x", "y")
    assert r["shared_users"] == 2 and r["users_a"] == 3 and r["users_b"] == 3
    assert abs(r["jaccard"] - 0.5) < 1e-12


def test_tfidf_rare_term_outranks_common_at_equal_tf(spark):
    docs = spark.createDataFrame(
        [(0, "en", "w", "alpha beta"), (1, "en", "w", "alpha gamma"),
         (2, "en", "w", "alpha delta")],
        "doc_id long, lang string, source string, text string",
    )
    out = sampling.tfidf_top_terms(docs, top_n=1).collect()
    # 'alpha' appears in every doc (df=3, idf=0) -> the rare term wins
    by_doc = {r["doc_id"]: r for r in out}
    assert by_doc[0]["token"] == "beta" and by_doc[0]["tfidf_micro"] > 0
    assert by_doc[1]["token"] == "gamma"
    alpha = [r for r in sampling.tfidf_top_terms(docs, top_n=2).collect()
             if r["token"] == "alpha"]
    assert all(r["tfidf_micro"] == 0 for r in alpha)


def test_mixture_equalize_downsamples_to_smallest_source(spark):
    from twitch_chat_analyser_spark.operators.sampling import mixture_equalize

    rows = (
        [(i, "big") for i in range(4000)]
        + [(10_000 + i, "mid") for i in range(1000)]
        + [(20_000 + i, "small") for i in range(200)]
    )
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    out = mixture_equalize(docs)
    counts = {r["source"]: r["n"] for r in out.groupBy("source").agg(
        __import__("pyspark").sql.functions.count("*").alias("n")).collect()}
    # smallest source survives intact; others land near its size
    # (hash-Bernoulli -> binomial noise, allow a wide band)
    assert counts["small"] == 200
    assert 140 <= counts["big"] <= 260
    assert 140 <= counts["mid"] <= 260
    # deterministic: the same call selects the same rows
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(r["doc_id"] for r in mixture_equalize(docs).collect())
    assert a == b


def test_decontamination_flags_overlapping_docs(spark):
    from twitch_chat_analyser_spark.operators.llmops import decontamination

    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta"),          # eval doc
            (1, "zeta eta theta iota"),             # eval doc
            (2, "alpha beta gamma something else"), # shares 'alpha beta gamma'
            (3, "completely different words here"),
            (4, "x zeta eta theta iota y"),         # shares 2 eval shingles
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["n_shared_shingles"]
        for r in decontamination(docs, [0, 1]).collect()
    }
    assert out == {2: 1, 4: 2}


# --- global_row_number: the distributed total-order rank -------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(
    vals=st.lists(
        st.integers(min_value=0, max_value=5),  # heavy ties on purpose
        min_size=1,
        max_size=120,
    )
)
def test_global_row_number_equals_plain_row_number(spark, vals):
    """Property: the two-phase distributed rank (range partition ->
    per-partition rank -> prefix offsets) is bit-identical to a plain
    partition-less row_number over the same order, ties included."""
    from pyspark.sql import Window

    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "id long, v long").repartition(7)
    order = [F.desc("v"), F.asc("id")]
    got = {
        r["id"]: r["rank"]
        for r in analytics.global_row_number(df, order, out="rank").collect()
    }
    want = {
        r["id"]: r["rank"]
        for r in df.withColumn(
            "rank", F.row_number().over(Window.orderBy(*order)).cast("long")
        ).collect()
    }
    assert got == want


def test_global_row_number_total_col(spark):
    df = spark.createDataFrame([(i, i % 3) for i in range(25)], "id long, v long")
    out = analytics.global_row_number(
        df, [F.asc("v"), F.asc("id")], out="rn", total_col="n"
    ).collect()
    assert {r["n"] for r in out} == {25}
    assert sorted(r["rn"] for r in out) == list(range(1, 26))


def test_resample_static_bounds_builds_without_driver_actions(spark):
    """The folded resample contract: with explicit bounds, CONSTRUCTING
    the plan runs ZERO Spark jobs — the count-dependent branches live in
    the plan, not in a driver-side collect (the pre-fix code ran a
    stats job per call before the real query). One action then computes
    the result (AQE may stage that action into several internal jobs)."""
    from twitch_chat_analyser_spark.functions.resample import (
        resample_time_series,
    )

    series = spark.createDataFrame(
        [(i * 1000, i * 3) for i in range(50)], "timestamp long, v long"
    )
    sc = spark.sparkContext
    sc.setJobGroup("resample-build", "plan-construction probe")
    try:
        plan = resample_time_series(series, "v", 10, 0, 49_000)
    finally:
        sc.setJobGroup(None, None)
    build_jobs = sc.statusTracker().getJobIdsForGroup("resample-build")
    assert build_jobs == [], f"plan construction ran jobs: {build_jobs}"
    assert len(plan.collect()) == 10  # and the plan actually answers


# --- round-3 additions: epoch shuffle / quality filter / group-safe split --


def test_epoch_shuffle_is_permutation_and_epoch_dependent(spark):
    docs = _docs(spark, 300)
    e1 = sampling.epoch_shuffle(docs, epoch=1).collect()
    ranks = sorted(r["shuffle_rank"] for r in e1)
    assert ranks == list(range(1, 301))  # exact 1..n permutation
    # deterministic: same epoch -> identical order
    again = {r["doc_id"]: r["shuffle_rank"] for r in
             sampling.epoch_shuffle(docs, epoch=1).collect()}
    assert again == {r["doc_id"]: r["shuffle_rank"] for r in e1}
    # different epoch -> different permutation (md5 re-key)
    e2 = {r["doc_id"]: r["shuffle_rank"] for r in
          sampling.epoch_shuffle(docs, epoch=2).collect()}
    assert e2 != again


def test_quality_top_fraction_exact_per_source_cutoff(spark):
    import math

    # two sources with different sizes and a quality gradient: doc text
    # repeats 'the' (a stopword) more for lower ids -> higher score
    rows = [
        (i, "en", "web" if i < 30 else "books",
         ("the " * (50 - i % 50)).strip() or "zzz")
        for i in range(50)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, lang string, source string, text string"
    )
    out = sampling.quality_top_fraction(docs, keep_fraction=0.5).collect()
    by_source = {}
    for r in out:
        by_source.setdefault(r["source"], []).append(r)
    assert len(by_source["web"]) == math.ceil(30 * 0.5)
    assert len(by_source["books"]) == math.ceil(20 * 0.5)
    # the kept set IS the top-k by (score desc, doc_id): ranks are 1..k
    for rs in by_source.values():
        assert sorted(r["q_rank"] for r in rs) == list(range(1, len(rs) + 1))


def test_group_safe_split_keeps_exact_duplicates_together(spark):
    # pairs of documents with identical normalized content but distinct
    # ids — an id-hash split could separate them; the content-hash split
    # must not
    rows = []
    for i in range(100):
        rows.append((2 * i, "en", "web", f"Some Document   {i}"))
        rows.append((2 * i + 1, "en", "web", f"some document {i} "))
    docs = spark.createDataFrame(
        rows, "doc_id long, lang string, source string, text string"
    )
    out = sampling.group_safe_split(docs, 0.8).collect()
    by_hash = {}
    for r in out:
        by_hash.setdefault(r["content_hash"], set()).add(r["split"])
    assert len(by_hash) == 100  # normalization collapsed each pair
    assert all(len(sides) == 1 for sides in by_hash.values())


def test_mixture_temperature_upweights_small_sources(spark):
    from twitch_chat_analyser_spark.operators.sampling import (
        mixture_temperature,
    )

    rows = (
        [(i, "big") for i in range(4000)]
        + [(10_000 + i, "small") for i in range(250)]
    )
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    out = mixture_temperature(docs, tau=0.5, budget_fraction=0.5)
    counts = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(
            __import__("pyspark").sql.functions.count("*").alias("n")
        ).collect()
    }
    # B = 2125, Z = sqrt(4000) + sqrt(250) = 79.06; target shares
    # q_big = 0.80, q_small = 0.20 -> ~1700 big, ~425 small (vs the
    # natural 0.94/0.06 split). small's keep-rate 425/250 > 1 -> all kept
    assert counts["small"] == 250
    assert 1550 <= counts["big"] <= 1850
    # tau=1 reproduces the natural mixture at the budget rate
    nat = mixture_temperature(docs, tau=1.0, budget_fraction=0.5)
    ncounts = {
        r["source"]: r["n"]
        for r in nat.groupBy("source").agg(
            __import__("pyspark").sql.functions.count("*").alias("n")
        ).collect()
    }
    assert 1850 <= ncounts["big"] <= 2150  # ~0.5 * 4000
    assert 90 <= ncounts["small"] <= 160  # ~0.5 * 250
    # deterministic re-run
    assert sorted(r["doc_id"] for r in out.collect()) == sorted(
        r["doc_id"]
        for r in mixture_temperature(docs, 0.5, 0.5).collect()
    )


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(
    sizes=st.lists(st.integers(min_value=5, max_value=400), min_size=2, max_size=5),
    budget=st.sampled_from([0.25, 0.5, 0.8]),
)
def test_mixture_temperature_properties(spark, sizes, budget):
    """Properties over random source-size profiles: selection is a
    subset of the corpus, per-source keep counts respect the computed
    rate's binomial envelope at tau=1 (natural mixture == flat budget
    rate), and no source with a keep-rate of 1 loses a row."""
    from twitch_chat_analyser_spark.operators.sampling import (
        mixture_temperature,
    )

    rows = []
    off = 0
    for si, n in enumerate(sizes):
        rows += [(off + i, f"s{si}") for i in range(n)]
        off += 10_000
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    out = mixture_temperature(docs, tau=1.0, budget_fraction=budget)
    got = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(
            __import__("pyspark").sql.functions.count("*").alias("n")
        ).collect()
    }
    ids = {r["doc_id"] for r in out.collect()}
    all_ids = {r[0] for r in rows}
    assert ids <= all_ids
    # tau=1 -> every source keeps ~budget of its rows (hash-Bernoulli:
    # allow a generous binomial band, floor-of-rate can only undershoot)
    import math

    for si, n in enumerate(sizes):
        kept = got.get(f"s{si}", 0)
        assert kept <= n
        sd = math.sqrt(n * budget * (1 - budget))
        assert abs(kept - budget * n) <= 4 * sd + 2, (si, n, kept)


def test_k_per_group_sample_exact_sizes(spark):
    rows = [(i, "big") for i in range(100)] + [
        (1000 + i, "tiny") for i in range(3)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    out = sampling.k_per_group_sample(docs, k=10, group_col="source")
    counts = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(
            __import__("pyspark").sql.functions.count("*").alias("n")
        ).collect()
    }
    # exact min(k, |group|) per group
    assert counts == {"big": 10, "tiny": 3}
    rows1 = out.collect()
    assert all(1 <= r["pick_rank"] <= 10 for r in rows1)
    # deterministic across invocations
    assert sorted(r["doc_id"] for r in rows1) == sorted(
        r["doc_id"]
        for r in sampling.k_per_group_sample(docs, 10, "source").collect()
    )


def test_token_budget_sample_admits_in_hash_order_until_budget(spark):
    rows = [(i, "en", "web", " ".join(["w"] * 10)) for i in range(20)]
    docs = spark.createDataFrame(
        rows, "doc_id long, lang string, source string, text string"
    )
    out = sampling.token_budget_sample(docs, budget_per_source=35).collect()
    # 10 tokens per doc: docs admitted while tokens_before < 35 ->
    # exactly 4 docs (0, 10, 20, 30 tokens before)
    assert len(out) == 4
    assert sorted(r["tokens_before"] for r in out) == [0, 10, 20, 30]
    # a tiny budget still admits the first doc per source
    first = sampling.token_budget_sample(docs, budget_per_source=1).collect()
    assert len(first) == 1 and first[0]["tokens_before"] == 0


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(
    tokens_per_doc=st.lists(
        st.integers(min_value=1, max_value=30), min_size=1, max_size=40
    ),
    budget=st.integers(min_value=1, max_value=200),
)
def test_token_budget_matches_python_reference(spark, tokens_per_doc, budget):
    """Property: the admitted set is exactly the prefix of the
    hash-ordered docs whose preceding cumulative tokens < budget."""
    import hashlib

    rows = [
        (i, "en", "web", " ".join(["w"] * n))
        for i, n in enumerate(tokens_per_doc)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, lang string, source string, text string"
    )
    got = sorted(
        r["doc_id"]
        for r in sampling.token_budget_sample(docs, budget).collect()
    )
    order = sorted(
        range(len(tokens_per_doc)),
        key=lambda i: (hashlib.md5(str(i).encode()).hexdigest()[:4], i),
    )
    want, run = [], 0
    for i in order:
        if run < budget:
            want.append(i)
        run += tokens_per_doc[i]
    assert got == sorted(want)


def test_weighted_sample_matches_python_reference(spark):
    import hashlib
    import math

    rows = [(i, (i % 7 + 1) * 10) for i in range(300)]
    docs = spark.createDataFrame(rows, "doc_id long, n_chars long")
    out = sampling.weighted_sample(docs, k=25).collect()

    def es_key(doc_id, w):
        h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16)
        u = (h + 0.5) / 2**32
        return round(math.log(u) / w, 12)

    ref = sorted(
        ((es_key(i, w), i, w) for i, w in rows), key=lambda t: (-t[0], t[1])
    )[:25]
    assert [(r["doc_id"], r["weight"]) for r in out] == [
        (i, w) for _, i, w in ref
    ]
    assert [r["rank"] for r in out] == list(range(1, 26))


def test_weighted_sample_favors_heavy_weights(spark):
    # weight 1000 vs weight 1: the heavy half should dominate the
    # sample (deterministic, so this is a fixed fact of the hash, but
    # it pins the direction of the weighting — a 1/w bug would flip it)
    rows = [(i, 1000 if i < 500 else 1) for i in range(1000)]
    docs = spark.createDataFrame(rows, "doc_id long, n_chars long")
    out = sampling.weighted_sample(docs, k=50).collect()
    heavy = sum(1 for r in out if r["weight"] == 1000)
    assert heavy >= 45


# --------------------------------------------------------------------------
# DSIR importance resampling
# --------------------------------------------------------------------------


def _dsir_docs(spark):
    # two sharply-separated vocabularies: target-ish docs speak "alpha",
    # off-target docs speak "zulu" (different md5 buckets w.h.p.)
    rows = []
    for i in range(40):
        rows.append((i, "en", "web", "alpha beta gamma alpha"))
    for i in range(40, 80):
        rows.append((i, "de", "web", "zulu yankee xray zulu"))
    # a few "de"-labeled docs that nonetheless speak the target tongue
    for i in range(80, 90):
        rows.append((i, "de", "web", "alpha beta gamma alpha"))
    return spark.createDataFrame(
        rows, "doc_id long, lang string, source string, text string"
    )


def test_dsir_upweights_target_distribution_docs(spark):
    out = sampling.dsir_select(_dsir_docs(spark), "en", k=30).collect()
    assert len(out) == 30
    picked = {r["doc_id"] for r in out}
    # the 50 target-tongue docs (ids <40 and 80-89) dominate the draw:
    # their hashed-unigram profile matches the target model
    target_tongue = set(range(40)) | set(range(80, 90))
    assert len(picked & target_tongue) >= 25
    # log-weights separate the two vocabularies by construction
    weights = {r["doc_id"]: r["logw_micro"] for r in out}
    for d, w in weights.items():
        if d in target_tongue:
            assert w > 0
        else:
            assert w < 0


def test_dsir_is_deterministic_and_ranked(spark):
    docs = _dsir_docs(spark)
    a = sampling.dsir_select(docs, "en", k=20).collect()
    b = sampling.dsir_select(docs, "en", k=20).collect()
    assert [r["doc_id"] for r in a] == [r["doc_id"] for r in b]
    keys = [r["dsir_key"] for r in a]
    assert keys == sorted(keys, reverse=True)
    assert [r["rank"] for r in a] == list(range(1, 21))
