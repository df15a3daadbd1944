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

from pyspark.sql import DataFrame, SparkSession
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


def order_value_digests(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile per group — the one-pass partial-mergeable
    quantile path promised in tpch.percentile_order_values' scale note.
    accuracy=10000 makes the GATE-scale (sf0.01, ~3k rows/group) result
    exact — the summary holds every value and returns the
    rank-ceil(p*n) order statistic. Beyond that the per-partition
    summary MERGES compound the error bound, so larger scales are the
    usual bounded-error estimate (verified: sf0.1 deviates by ~1e-4
    relative — the sketch behaving as designed).

    -> o_orderpriority, approx_median, approx_p90
    """
    orders = ingest.load(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.expr(
            "approx_percentile(o_totalprice, array(0.5D, 0.9D), 10000)"
        ).alias("q")
    ).select(
        "o_orderpriority",
        F.col("q")[0].alias("approx_median"),
        F.col("q")[1].alias("approx_p90"),
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
# registry entries. DataSketches HLL estimates are sketch-library-specific
# (rows-only); the portable HLL above carries a bit-exact oracle; the
# quantile summary at accuracy=10000 degenerates to EXACT order
# statistics at gate scale (every group holds < accuracy values), so it
# carries a plain-SQL oracle.
# --------------------------------------------------------------------------


def _q_sketch_chatters(spark: SparkSession, sf_dir: str) -> DataFrame:
    return channel_chatters_via_sketch_merge(ingest.messages(spark, sf_dir))


def _q_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return order_value_digests(spark, sf_dir)


def _q_hll_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    return portable_hll_chatters(ingest.messages(spark, sf_dir))


SKETCH_QUERIES = {
    "sketch_distinct_chatters": _q_sketch_chatters,
    "sketch_hll_portable": _q_hll_portable,
    "approx_percentile_order_values": _q_approx_percentiles,
}


def sketch_oracles() -> dict[str, str]:
    """Spark's quantile summary with an uncompressed buffer returns the
    value at rank ``ceil(p * n)`` (verified empirically at sf0.001 and
    sf0.01 for every group x percentile) — reproduced with an explicit
    row_number rank selection. Valid while every group stays under the
    10000-value accuracy budget; at larger SFs the sketch approximates
    and the oracle no longer applies (the gate runs sf0.01)."""
    from ..registry import chat_ctes

    return {
        # the portable HLL, register-for-register: same shared SQL
        # fragments as the Spark plan (module constants), integer-scaled
        # harmonic sum (1<<50 >> rho via the dialect's shift), embedded
        # ln lookup for the small-range correction -> bit-identical
        # estimate
        "sketch_hll_portable": f"""{chat_ctes()},
regs AS (
    SELECT channel, {_HLL_REG} AS reg, max({_HLL_RHO}) AS mrho
    FROM messages GROUP BY 1, 2
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
        "approx_percentile_order_values": """
SELECT o_orderpriority,
       max(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT)
                THEN o_totalprice END) AS approx_median,
       max(CASE WHEN rn = CAST(ceil(0.9 * n) AS BIGINT)
                THEN o_totalprice END) AS approx_p90
FROM (
    SELECT o_orderpriority, o_totalprice,
           row_number() OVER (PARTITION BY o_orderpriority
                              ORDER BY o_totalprice) AS rn,
           count(*) OVER (PARTITION BY o_orderpriority) AS n
    FROM orders
) GROUP BY o_orderpriority""",
    }
