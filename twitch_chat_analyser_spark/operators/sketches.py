"""Mergeable-sketch aggregates: HLL distinct counting and t-digest
quantiles — the re-aggregation path that makes 100 TB interactive.

The reference has no approximate aggregates (SURVEY §2.D); its
distinct-ish questions are all exact SQL over pre-aggregated facts. At
100 TB, exact COUNT(DISTINCT) over raw events is a full shuffle of the
key universe per question asked. Sketches fix the *re-aggregation*
problem: persist a tiny sketch per (dims, bucket) once, then answer any
coarser rollup (channel/month, all-channels/day, …) by merging sketches
— never re-touching raw data. That's the same continuous-aggregate idea
as operators/rollups.py, extended to non-additive measures
(distinct counts ARE NOT summable; their sketches are).

Built on Spark's Apache DataSketches HLL functions (hll_sketch_agg /
hll_union_agg / hll_sketch_estimate) — partial-mergeable, so Catalyst
plans them with map-side partials like any sum. Estimates are
sketch-implementation-specific, so these are rows-only queries for the
driver; pytest pins exactness at small cardinalities (HLL is exact far
beyond test-data cardinality) and invariance of the merge path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import ingest

DAY_MS = 86_400_000


def daily_chatter_sketches(messages: DataFrame) -> DataFrame:
    """The persisted base table: one HLL sketch of the distinct-chatter
    set per (channel, day). At scale this is the only pass over raw
    events; everything below consumes sketches.

    -> channel, day_ms, chatter_sketch (binary), daily_chatters (est)
    """
    return (
        messages.withColumn(
            "day_ms", F.expr(f"(timestamp div {DAY_MS}) * {DAY_MS}")
        )
        .groupBy("channel", "day_ms")
        .agg(F.hll_sketch_agg("username").alias("chatter_sketch"))
        .withColumn(
            "daily_chatters",
            F.hll_sketch_estimate("chatter_sketch").cast("long"),
        )
    )


def merge_chatters(sketches: DataFrame, dims: list[str]) -> DataFrame:
    """Re-aggregate persisted sketches to any coarser grouping: distinct
    chatters per ``dims`` WITHOUT re-reading events. Distinct counts
    don't sum — a chatter active on two days is one chatter — but their
    sketches union losslessly.

    -> *dims, distinct_chatters
    """
    return (
        sketches.groupBy(*dims)
        .agg(F.hll_union_agg("chatter_sketch").alias("s"))
        .select(
            *dims,
            F.hll_sketch_estimate("s").cast("long").alias("distinct_chatters"),
        )
    )


def channel_chatters_via_sketch_merge(messages: DataFrame) -> DataFrame:
    """Per-channel all-time distinct chatters computed the scale way:
    daily sketches -> union per channel. Equals exact COUNT(DISTINCT)
    at test cardinalities (HLL is exact in sparse mode).

    -> channel, distinct_chatters
    """
    return merge_chatters(daily_chatter_sketches(messages), ["channel"])


# Gate margin for the DataSketches HLL estimate. The sketch runs at
# the default lgConfigK=12, rsd ≈ 1.04/√4096 ≈ 1.6%; a 10% bound is
# therefore ≈ 6σ — residual probability of a CORRECT sketch tripping
# the gate ≈ 1e-9 per channel at Gaussian tails, i.e. never in
# practice at ANY scale factor (VERDICT r7 #8: the old 5% ≈ 3σ bound
# could deterministically fail on a tail estimate at a new SF without
# any regression). The gate keeps its power against real breakage:
# the failure mode it exists for — a broken daily-sketch UNION path
# (double-counted or dropped days) — is off by whole multiples, not
# percent. At gate cardinalities (≲ thousands of chatters/channel)
# the estimate sits in HLL's exact sparse range anyway, so observed
# failure probability is ~0 and any deviation at all is a merge bug.
SKETCH_EPS_PCT = 10


def channel_chatters_sketch_checked(messages: DataFrame) -> DataFrame:
    """The DataSketches estimate made DRIVER-CHECKABLE: emit the exact
    distinct count plus an in-plan ``within_bound`` boolean
    (|est - exact| / exact <= SKETCH_EPS_PCT%), so the oracle side is
    fully deterministic (exact count + literal TRUE) while the
    engine-specific estimate is still exercised — approximate is not
    unverifiable. The bound test is pure integer arithmetic
    (10*|diff| <= exact for the 10% ≈ 6σ bound): no float in the
    output.

    -> channel, n_chatters, within_bound
    """
    est = channel_chatters_via_sketch_merge(messages)
    exact = messages.groupBy("channel").agg(
        F.countDistinct("username").cast("long").alias("n_chatters")
    )
    mult = 100 // SKETCH_EPS_PCT
    return (
        exact.join(est, "channel")
        .select(
            "channel",
            "n_chatters",
            (
                F.abs(F.col("distinct_chatters") - F.col("n_chatters")) * mult
                <= F.col("n_chatters")
            ).alias("within_bound"),
        )
        .orderBy("channel")
    )


PCTL_ACCURACY = 10000


def order_value_digests(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile per group — the one-pass partial-mergeable
    quantile path promised in tpch.percentile_order_values' scale note
    — made driver-checkable AT ANY SCALE FACTOR *at sketch cost*.

    The round-8 variant computed its truth as the exact rank-ceil(p·n)
    order statistics via row_number over a 5-value partition key — five
    near-global sorts, the registry's one scale-killer shape and its
    only >30% regression (VERDICT r8 #1). This variant checks the
    sketch's documented guarantee DIRECTLY, with no sort anywhere: the
    guarantee is a statement about the estimate's exact RANK
    (accuracy a keeps rank error ≤ n/a; ×2 for summary-merge
    compounding), and an exact rank is two whole-stage-codegen sums —
    ``lt = Σ(x < e)`` and ``le = Σ(x ≤ e)`` — in a second linear pass
    over the data. The estimate's true rank interval ``[lt+1, le]``
    (the tie bracket) must intersect ``p·n ± (2n/a + 1)``; a sketch
    returning garbage (min, max, a wrong group's value) lands tens of
    rank-widths out and flips the boolean. This is a strictly TIGHTER
    gate than both prior shapes — exact ranks, no sampling slack — and
    costs two linear scans + two 5-row hash aggregations: no window,
    no sort, no shuffle beyond the 5-key agg. The shape holds at 100×.

    The emitted value columns are exact single-pass group aggregates
    (count/min/max — bit-identical across engines) so the oracle hash
    pins the whole row; the oracle emits the same aggregates + literal
    TRUE for the bound columns.

    -> o_orderpriority, n_orders, price_min, price_max,
       within_bound_50, within_bound_90
    """
    orders = ingest.load(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_totalprice"
    )
    # pass 1: the sketch under test. The collect is a BOUNDED 5-row
    # group aggregate (o_orderpriority's domain) — the audited
    # small-side-broadcast pattern; embedding the estimates as
    # literals saves the BroadcastExchange stage + join that kept the
    # two-job plan at ~0.7 s of pure local scheduling overhead.
    est = (
        orders.groupBy("o_orderpriority")
        .agg(
            F.expr(
                "approx_percentile(o_totalprice, array(0.5D, 0.9D),"
                f" {PCTL_ACCURACY})"
            ).alias("q")
        )
        .collect()
    )
    if not est:
        return spark.createDataFrame(
            [],
            "o_orderpriority string, n_orders long, price_min double,"
            " price_max double, within_bound_50 boolean,"
            " within_bound_90 boolean",
        )

    def _lit_map(idx: int):
        expr = F.when(
            F.col("o_orderpriority") == est[0]["o_orderpriority"],
            F.lit(est[0]["q"][idx]),
        )
        for r in est[1:]:
            expr = expr.when(
                F.col("o_orderpriority") == r["o_orderpriority"],
                F.lit(r["q"][idx]),
            )
        return expr

    a50, a90 = _lit_map(0), _lit_map(1)
    # pass 2: exact ranks of the estimates via conditional sums + the
    # exact output aggregates — ONE whole-stage-codegen hash agg,
    # map-side partials, 5-row shuffle
    ranks = orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.min("o_totalprice").alias("price_min"),
        F.max("o_totalprice").alias("price_max"),
        F.sum((F.col("o_totalprice") < a50).cast("long")).alias("lt50"),
        F.sum((F.col("o_totalprice") <= a50).cast("long")).alias("le50"),
        F.sum((F.col("o_totalprice") < a90).cast("long")).alias("lt90"),
        F.sum((F.col("o_totalprice") <= a90).cast("long")).alias("le90"),
    )

    def _within(p: float, lt: str, le: str):
        k = F.lit(2.0) * F.col("n_orders") / PCTL_ACCURACY + F.lit(1.0)
        target = F.lit(p) * F.col("n_orders")
        return ((F.col(lt) + 1) <= (target + k)) & (
            F.col(le) >= (target - k)
        )

    # no final orderBy: 5 rows, and the driver's value hash is
    # row-order-insensitive — dropping it saves a range exchange+sort
    return ranks.select(
        "o_orderpriority",
        "n_orders",
        "price_min",
        "price_max",
        _within(0.5, "lt50", "le50").alias("within_bound_50"),
        _within(0.9, "lt90", "le90").alias("within_bound_90"),
    )


# --------------------------------------------------------------------------
# Cross-engine-verifiable HLL: the same sketch math as above, but with
# every source of engine-specific nondeterminism designed out so DuckDB
# reproduces the ESTIMATE bit-for-bit — the counter-demonstration to the
# two rows-only DataSketches queries (approximate != unverifiable).
# --------------------------------------------------------------------------

# 2 md5 hex nibbles -> 256 registers; remaining 14 nibbles (56 bits)
# feed the leading-zero rank, so rho in [1, 57].
HLL_M = 256
HLL_SCALE = 1 << 50  # integer-scaled 2^-rho terms
HLL_NUMER = float(1 << 66)  # alpha * m^2 * SCALE numerator, exact double
HLL_ALPHA = 0.7182725932495458  # alpha_256 = 0.7213 / (1 + 1.079/256)

# Small-range (linear counting) correction WITHOUT calling the engine's
# ln(): with V zero registers the correction is m * ln(m / V), and m/V
# takes only HLL_M distinct values — precompute ln once (CPython libm)
# and embed the values as IDENTICAL decimal literals in both engines'
# expressions (repr round-trips doubles exactly), so the correction is
# a 1-based table lookup + one correctly-rounded multiply, not a libm
# call that differs in the last ulp between engines.
import math as _math

HLL_LN_TABLE = [_math.log(HLL_M / v) for v in range(1, HLL_M + 1)]

# SQL fragments valid with IDENTICAL semantics in Spark SQL and DuckDB
# (instr/substr/length/regexp_replace/CASE), so both engines evaluate
# the same expression tree over the same md5 text.
_HLL_H = "md5(username)"
_HLL_REG = (
    f"instr('0123456789abcdef', substr({_HLL_H}, 1, 1)) * 16 + "
    f"instr('0123456789abcdef', substr({_HLL_H}, 2, 1)) - 17"
)
_HLL_STRIPPED = f"regexp_replace(substr({_HLL_H}, 3, 14), '^0+', '')"
_HLL_FIRST = f"(instr('0123456789abcdef', substr({_HLL_STRIPPED}, 1, 1)) - 1)"
_HLL_RHO = (
    f"CASE WHEN length({_HLL_STRIPPED}) = 0 THEN 57 ELSE "
    f"(14 - length({_HLL_STRIPPED})) * 4 + "
    f"(CASE WHEN {_HLL_FIRST} >= 8 THEN 0 WHEN {_HLL_FIRST} >= 4 THEN 1 "
    f"WHEN {_HLL_FIRST} >= 2 THEN 2 ELSE 3 END) + 1 END"
)


def portable_hll_chatters(messages: DataFrame) -> DataFrame:
    """Per-channel distinct-chatter estimate from a hand-rolled,
    ENGINE-PORTABLE HLL — same register/max-rho/harmonic-mean math as
    DataSketches, but deterministic across engines by construction:

    - the hash family is md5 text (identical hex in Spark and DuckDB);
    - the register index and leading-zero rank are integer expressions
      over hex nibbles (no engine bit intrinsics);
    - the 2^-rho harmonic sum is INTEGER-scaled (``(1 << 50) >> rho``,
      exact, overflow-free, addition-order-free) instead of float
      summation (order-dependent rounding) or ``power()`` (not
      correctly-rounded everywhere);
    - the final estimate is literal-constant multiplies and one divide
      — IEEE correctly-rounded operations, bit-identical — and the
      standard small-range linear-counting correction (E <= 2.5m with
      zero registers present -> m * ln(m/V)) reads ln from an embedded
      literal TABLE (``HLL_LN_TABLE``, only m possible arguments)
      instead of the engine's libm, the one term no two libms agree on.

    Registers never materialize per-event state: the plan is the same
    partial-mergeable shape as the DataSketches path (map-side partial
    max per (channel, register), 256-row-per-channel shuffle).

    -> channel, exact_chatters, hll_est, rel_err_pct  (sorted)
    """
    exact = messages.groupBy("channel").agg(
        F.countDistinct("username").alias("exact_chatters")
    )
    return (
        hll_estimate(hll_registers(messages))
        # one row per channel on each side; broadcast beats the
        # sort-merge the optimizer picks without stats
        .join(F.broadcast(exact), "channel")
        .select(
            "channel",
            "exact_chatters",
            "hll_est",
            F.round(
                F.lit(100.0)
                * F.abs(F.col("hll_est") - F.col("exact_chatters"))
                / F.col("exact_chatters"),
                3,
            ).alias("rel_err_pct"),
        )
        .orderBy("channel")
    )


def hll_registers(messages: DataFrame, dims: list[str] | None = None) -> DataFrame:
    """The sketch STATE: per (dims, register) max leading-zero rank —
    the max-mergeable representation. Partial max runs map-side; any
    union of register tables re-merged with ``max`` is the register
    table of the unioned inputs (idempotent + commutative), which is
    what makes incremental streaming maintenance and arbitrary rollups
    exact (streaming/hll.py).

    -> *dims, reg, mrho
    """
    dims = dims or ["channel"]
    return (
        # a NULL hash input would create a NULL reg group that inflates
        # n_regs (count(*)) without contributing to s_hit — drop it
        messages.filter(F.col("username").isNotNull())
        .select(
            *dims, F.expr(_HLL_REG).alias("reg"), F.expr(_HLL_RHO).alias("rho")
        )
        .groupBy(*dims, "reg")
        .agg(F.max("rho").alias("mrho"))
    )


def hll_estimate(regs: DataFrame, dims: list[str] | None = None) -> DataFrame:
    """Registers -> rounded distinct estimate (raw harmonic estimator +
    embedded-ln small-range correction; see portable_hll_chatters for
    the determinism argument).

    -> *dims, hll_est
    """
    dims = dims or ["channel"]
    per = regs.groupBy(*dims).agg(
        F.count("*").alias("n_regs"),
        F.sum(
            F.expr(f"shiftright(cast({HLL_SCALE} as bigint), mrho)")
        ).alias("s_hit"),
    )
    raw = (F.lit(HLL_ALPHA) * F.lit(HLL_NUMER)) / (
        F.col("s_hit")
        + (F.lit(HLL_M) - F.col("n_regs")) * F.lit(HLL_SCALE)
    ).cast("double")
    v_zero = F.lit(HLL_M) - F.col("n_regs")
    ln_lookup = F.expr(
        "element_at(array("
        + ", ".join(f"{x!r}D" for x in HLL_LN_TABLE)
        + f"), CAST({HLL_M} - n_regs AS INT))"
    )
    est = F.when(
        (raw <= F.lit(2.5 * HLL_M)) & (v_zero > 0),
        F.lit(float(HLL_M)) * ln_lookup,
    ).otherwise(raw)
    return per.select(*dims, F.round(est, 2).alias("hll_est"))


# --------------------------------------------------------------------------
# KMV (k-minimum-values) distinct sketch with SET-OPERATION estimates —
# the capability HLL lacks: two KMV sketches support union AND
# intersection estimation (Beyer et al., "On synopses for distinct-value
# estimation under multiset operations", SIGMOD'07), which is what
# audience-overlap questions ("how many chatters do channels A and B
# share?") need without a COUNT(DISTINCT) over the pair blowup.
# Engine-portable by the same construction as the HLL above: the hash is
# a 60-bit integer assembled nibble-by-nibble from md5 hex (identical
# instr/substr expression tree in Spark and DuckDB), every intermediate
# is exact BIGINT, and the only floats are the final correctly-rounded
# literal-constant divisions.
# --------------------------------------------------------------------------

KMV_K = 64
# (k-1) * 2^60: the KMV estimator numerator. 63 * 2^60 is exactly
# representable in a double (6-bit mantissa), so the literal is exact in
# both engines.
KMV_NUMER = float((KMV_K - 1) * (1 << 60))

# 60-bit uniform hash from the first 15 hex nibbles of md5(username) —
# a pure instr/substr/md5 polynomial valid with identical semantics in
# Spark SQL and DuckDB (same portability trick as _HLL_REG/_HLL_RHO).
_KMV_HASH = " + ".join(
    # CAST each weight: small weights would parse as 32-bit INT in
    # Spark and the nibble product overflows under ANSI arithmetic
    f"(instr('0123456789abcdef', substr(md5(username), {i}, 1)) - 1)"
    f" * CAST({16 ** (15 - i)} AS BIGINT)"
    for i in range(1, 16)
)


def kmv_kmin(messages: DataFrame, k: int = KMV_K) -> DataFrame:
    """The sketch STATE: per-channel k minimum DISTINCT hash values.
    One distinct on (channel, hv) — a 2-column shuffle — then a
    channel-partitioned bottom-k window. The window sees only the
    channel's distinct hashes; at extreme per-channel cardinality the
    standard refinement is a pre-pass keeping the per-partition k-min
    before the global one (same two-phase shape the distributed rank
    in analytics.global_row_number uses), which changes no results.

    -> channel, hv
    """
    hashed = (
        messages.filter(F.col("username").isNotNull())
        .select("channel", F.expr(_KMV_HASH).alias("hv"))
        .distinct()
    )
    w = Window.partitionBy("channel").orderBy("hv")
    return (
        hashed.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= k)
        .select("channel", "hv")
    )


def _kmv_est(n, hk, k: int):
    """KMV estimate: exact count below k values, else (k-1)*2^60/h_k.
    Expression structure mirrored verbatim in the oracle SQL."""
    return F.when(n < k, n.cast("double")).otherwise(
        F.lit(KMV_NUMER) / hk.cast("double")
    )


def kmv_overlap(messages: DataFrame, k: int = KMV_K) -> DataFrame:
    """Audience-overlap estimates for every channel pair from the KMV
    sketches alone: per-side distinct estimates, the merged (union)
    sketch's estimate, and the intersection estimate via the k-min
    agreement ratio — ``|A∩B| ≈ ρ · |A∪B|`` where ρ is the fraction of
    the union sketch's k-min values present in BOTH sides' sketches.

    Shape (100 TB): after :func:`kmv_kmin` the WHOLE computation runs
    on ≤ k rows per channel (the sketches), never the fact table — the
    pair cross join is |channels|² tiny sketch-array rows, exactly the
    sketch-synopsis promise. (The r13 lazy checkpoint is gone: since
    the r14 array rewrite the sketch has exactly ONE consumer.)

    -> channel_a, channel_b, est_a, est_b, kmin_overlap, est_union,
       est_intersection
    """
    return kmv_overlap_from_sketch(kmv_kmin(messages, k), k)


def kmv_overlap_from_sketch(sk: DataFrame, k: int = KMV_K) -> DataFrame:
    """Pair estimates from an ALREADY-built (channel, hv) k-min sketch
    table — the serving entry point for the streaming-maintained store
    (streaming/kmv.py); :func:`kmv_overlap` is the batch composition.

    r14 rewrite (guide §2.4): each channel's sketch collapses into ONE
    sorted array row (bounded by k — always safe to collect), and every
    pair statistic the old 6-exchange pipeline computed (per-side
    estimates, the union's k-min via union+window, the k-min agreement
    count via ia/ib flag re-aggregation) is now a map-side array
    expression over the crossJoined pair of ≤k-element arrays:
    union k-min = slice(sort(array_union), 1, k), overlap =
    |ukmin ∩ a ∩ b|, side stats = size/last-element. Same integers in,
    same float expression trees, bit-identical milli-quantized outputs.
    """
    arrs = sk.groupBy("channel").agg(
        F.array_sort(F.collect_list("hv")).alias("hvs")
    )
    pairs = (
        arrs.select(
            F.col("channel").alias("channel_a"), F.col("hvs").alias("_ha")
        )
        .crossJoin(
            F.broadcast(
                arrs.select(
                    F.col("channel").alias("channel_b"),
                    F.col("hvs").alias("_hb"),
                )
            )
        )
        .filter(F.col("channel_a") < F.col("channel_b"))
        .select(
            "channel_a",
            "channel_b",
            "_ha",
            "_hb",
            F.expr(f"slice(array_sort(array_union(_ha, _hb)), 1, {k})")
            .alias("_uk"),
        )
    )
    n_a = F.size("_ha")
    n_b = F.size("_hb")
    hk_a = F.expr("element_at(_ha, size(_ha))")
    hk_b = F.expr("element_at(_hb, size(_hb))")
    un = F.size("_uk")
    hku = F.expr("element_at(_uk, size(_uk))")
    overlap = (
        F.expr("size(array_intersect(_uk, array_intersect(_ha, _hb)))")
        .cast("long")
    )
    est_a = _kmv_est(n_a, hk_a, k)
    est_b = _kmv_est(n_b, hk_b, k)
    eu = _kmv_est(un, hku, k)
    return (
        pairs.select(
            "channel_a",
            "channel_b",
            # estimates quantized ONCE to milli-units as BIGINTs so no
            # derived DOUBLE reaches a value-hash (float sweep, round 7)
            F.round(est_a * 1000, 0).cast("long").alias("est_a_milli"),
            F.round(est_b * 1000, 0).cast("long").alias("est_b_milli"),
            overlap.alias("kmin_overlap"),
            F.round(eu * 1000, 0).cast("long").alias("est_union_milli"),
            F.round(
                overlap.cast("double") / un.cast("double") * eu * 1000,
                0,
            )
            .cast("long")
            .alias("est_intersection_milli"),
        )
        .orderBy("channel_a", "channel_b")
    )


# --------------------------------------------------------------------------
# registry entries. DataSketches HLL estimates are sketch-library-specific
# (rows-only); the portable HLL above carries a bit-exact oracle; the
# quantile gate's emitted columns are exact group aggregates, so it
# carries a plain-SQL oracle (bound booleans checked Spark-side).
# --------------------------------------------------------------------------


def _q_sketch_chatters(spark: SparkSession, sf_dir: str) -> DataFrame:
    return channel_chatters_sketch_checked(ingest.messages(spark, sf_dir))


def _q_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return order_value_digests(spark, sf_dir)


def _q_hll_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    return portable_hll_chatters(ingest.messages(spark, sf_dir))


def _q_kmv_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    return kmv_overlap(ingest.messages(spark, sf_dir))


SKETCH_QUERIES = {
    "sketch_distinct_chatters": _q_sketch_chatters,
    "sketch_hll_portable": _q_hll_portable,
    "sketch_kmv_overlap": _q_kmv_overlap,
    "approx_percentile_order_values": _q_approx_percentiles,
}


def sketch_oracles() -> dict[str, str]:
    """The quantile gate's oracle emits the exact group aggregates
    (count/min/max — bit-identical in both engines) + literal TRUE
    bound columns; the Spark side computes the booleans for real from
    the estimates' EXACT ranks (two conditional sums), so a misbehaving
    sketch hash-mismatches. Scale-free: two linear scans, no sort."""
    from ..registry import chat_ctes

    return {
        # the DataSketches estimate is engine-specific, but the QUERY
        # contract is deterministic: exact distinct count + a bound
        # check the estimate must satisfy — the oracle's side of that
        # contract is the exact count and literal TRUE
        "sketch_distinct_chatters": f"""{chat_ctes()}
SELECT channel,
       CAST(count(DISTINCT username) AS BIGINT) AS n_chatters,
       TRUE AS within_bound
FROM messages GROUP BY channel""",
        # the portable HLL, register-for-register: same shared SQL
        # fragments as the Spark plan (module constants), integer-scaled
        # harmonic sum (1<<50 >> rho via the dialect's shift), embedded
        # ln lookup for the small-range correction -> bit-identical
        # estimate
        "sketch_hll_portable": f"""{chat_ctes()},
regs AS (
    SELECT channel, {_HLL_REG} AS reg, max({_HLL_RHO}) AS mrho
    FROM messages WHERE username IS NOT NULL GROUP BY 1, 2
),
per AS (
    SELECT channel, CAST(count(*) AS BIGINT) AS n_regs,
           CAST(sum({HLL_SCALE} >> mrho) AS BIGINT) AS s_hit
    FROM regs GROUP BY channel
),
est AS (
    SELECT channel, n_regs,
           {HLL_ALPHA} * {HLL_NUMER!r}
             / CAST(s_hit + ({HLL_M} - n_regs) * {HLL_SCALE} AS DOUBLE) AS raw
    FROM per
),
corrected AS (
    SELECT channel,
           CASE WHEN raw <= {2.5 * HLL_M!r} AND ({HLL_M} - n_regs) > 0
                THEN {float(HLL_M)!r} * list_extract(
                    [{', '.join(repr(x) for x in HLL_LN_TABLE)}],
                    {HLL_M} - n_regs)
                ELSE raw END AS e
    FROM est
),
exact AS (
    SELECT channel, CAST(count(DISTINCT username) AS BIGINT) AS exact_chatters
    FROM messages GROUP BY channel
)
SELECT c.channel, x.exact_chatters,
       round(c.e, 2) AS hll_est,
       round(100.0 * abs(round(c.e, 2) - x.exact_chatters)
             / x.exact_chatters, 3) AS rel_err_pct
FROM corrected c JOIN exact x ON x.channel = c.channel
ORDER BY c.channel""",
        # KMV set-op estimates, value-for-value: identical 60-bit
        # nibble-polynomial hash, identical bottom-k windows, and the
        # same CASE/divide expression shapes -> bit-identical estimates
        "sketch_kmv_overlap": f"""{chat_ctes()},
hv AS (
    SELECT DISTINCT channel, {_KMV_HASH} AS hv
    FROM messages WHERE username IS NOT NULL
),
sk AS (
    SELECT channel, hv FROM (
        SELECT channel, hv,
               row_number() OVER (PARTITION BY channel ORDER BY hv) AS r
        FROM hv
    ) WHERE r <= {KMV_K}
),
per AS (
    SELECT channel,
           CASE WHEN count(*) < {KMV_K} THEN CAST(count(*) AS DOUBLE)
                ELSE {KMV_NUMER!r} / CAST(max(hv) AS DOUBLE) END AS est
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
    ) WHERE r <= {KMV_K}
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
       pu.overlap AS kmin_overlap,
       CAST(round((CASE WHEN pu.un < {KMV_K} THEN CAST(pu.un AS DOUBLE)
                  ELSE {KMV_NUMER!r} / CAST(pu.hku AS DOUBLE) END)
                  * 1000, 0) AS BIGINT) AS est_union_milli,
       CAST(round(CAST(pu.overlap AS DOUBLE) / CAST(pu.un AS DOUBLE)
             * (CASE WHEN pu.un < {KMV_K} THEN CAST(pu.un AS DOUBLE)
                     ELSE {KMV_NUMER!r} / CAST(pu.hku AS DOUBLE) END)
             * 1000, 0) AS BIGINT) AS est_intersection_milli
FROM pairs p JOIN pu USING (channel_a, channel_b)""",
        "approx_percentile_order_values": """
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       min(o_totalprice) AS price_min,
       max(o_totalprice) AS price_max,
       TRUE AS within_bound_50,
       TRUE AS within_bound_90
FROM orders GROUP BY o_orderpriority""",
    }
