"""Relational-breadth queries on the TPC-H-ish testdata tables — the
capabilities the reference lacks but Spark provides for free (SURVEY.md
§2.D: set ops, rollup, multi-way joins, distinct aggregates), plus the
classic scan/agg/join shapes used as bench headliners.

Float determinism policy: monetary aggregates are summed as
DECIMAL(18,4) (exact, order-independent — safe against shuffle
nondeterminism) and only the final result is cast to DOUBLE, which both
engines round identically; raw stored doubles pass through untouched.

Scale notes (100 TB):
- q1 is a pure scan+agg: predicate and the 7-column projection push to
  the parquet scan; partial aggregation reduces each task to ≤ |groups|
  rows before the single shuffle.
- q3/q5 join small-dimension-filtered sides into the big fact. Only
  FIXED-cardinality relations carry a broadcast hint (region = 5 rows,
  nation = 25, 1-row aggregates): customer/part/supplier grow linearly
  with SF — billions of rows at 100 TB — so hinting them would OOM the
  driver at scale (review r12, same policy as the operator modules'
  vocabulary-sized sides). At test SFs Catalyst still broadcasts those
  sides from its size estimate (verified via explain in tests), so
  lineitem never shuffles for the join locally; past the threshold the
  plan flips to a shuffle join with AQE skew splitting — size-adaptive
  instead of hint-pinned.
- top-k per group is a window + filter: shuffle on the partition key,
  no global sort; global top-k (q3's LIMIT) is TakeOrderedAndProject.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import ingest

Q1_CUTOFF = "1998-09-02 00:00:00"
Q3_DATE = "1996-03-15 00:00:00"
Q3_SEGMENT = "BUILDING"
Q5_REGION = "ASIA"
Q5_YEAR_START = "1996-01-01 00:00:00"
Q5_YEAR_END = "1997-01-01 00:00:00"
ACCTBAL_CUT = 5000.0

DEC = "decimal(18,4)"


def _dec(col: str):
    return F.col(col).cast(DEC)


def _i4(col: str):
    """Exact scale-4 integer (value × 10⁴) from a raw double column.

    The double is first quantized to DECIMAL(18,4) (the repo-wide
    convention — deterministic in both engines because a double is
    never an exact decimal midpoint), then the unscaled integer is
    extracted exactly. All downstream math stays in int64, so the
    final int64→double emission is correctly rounded IDENTICALLY in
    Spark and DuckDB. Summing the decimal and casting the sum to
    DOUBLE is NOT portable: DuckDB converts via int128 arithmetic with
    an extra rounding, which produced a 1-ulp `sum_charge` mismatch at
    sf0.001 (round 8).
    """
    return (F.col(col).cast(DEC) * 10000).cast("long")


def _i4_sql(col: str) -> str:
    """DuckDB twin of :func:`_i4` (exact ×10⁴ int64 of a money column)."""
    return f"CAST(CAST({col} AS DECIMAL(18,4)) * 10000 AS BIGINT)"


# exact ×10⁴ int64 of l_extendedprice·(1−l_discount): the scale-8 integer
# product rounded half-up back to scale 4 in pure int64 math, so both
# engines agree bit for bit (see _i4 docstring for why decimal→DOUBLE
# emission is not portable). `div`/`//` truncate identically on the
# always-positive operands.
_REV_I4_SPARK = (
    f"({_i4_sql('l_extendedprice')}"
    f" * (10000 - {_i4_sql('l_discount')}) + 5000) div 10000"
)
_REV_I4_DUCK = _REV_I4_SPARK.replace(" div ", " // ")


def _rev_d():
    """Portable DOUBLE revenue aggregate: Σ rev_i4 emitted via int64."""
    return F.sum(F.expr(_REV_I4_SPARK)).cast("double") / F.lit(10000.0)


def _sum_d4(col: str):
    """Portable DOUBLE sum of a money column (exact ×10⁴ accumulation)."""
    return F.sum(_i4(col)).cast("double") / F.lit(10000.0)


# oracle-side twins (DuckDB sum(BIGINT) is HUGEINT → cast back to BIGINT
# before the correctly-rounded int64→double conversion)
REV_D_SQL = (
    f"CAST(CAST(sum({_REV_I4_DUCK}) AS BIGINT) AS DOUBLE) / 10000.0"
)


def SUM_D4_SQL(col: str) -> str:
    return (
        f"CAST(CAST(sum({_i4_sql(col)}) AS BIGINT) AS DOUBLE) / 10000.0"
    )


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = ingest.load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= Q1_CUTOFF
    )
    ints = li.select(
        "l_returnflag",
        "l_linestatus",
        _i4("l_quantity").alias("qi4"),
        _i4("l_extendedprice").alias("pi4"),
        _i4("l_discount").alias("di4"),
        _i4("l_tax").alias("ti4"),
    )
    # per-row products are exact int64 (≤ ~1.2e17); the scale-8/-12
    # products are rounded half-up back to scale 4 with pure integer
    # math ((x + 5·10^{s-5}) div 10^{s-4}) so every engine agrees bit
    # for bit; group sums stay well inside int64 through sf1000
    grouped = ints.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("qi4").alias("sqi"),
        F.sum("pi4").alias("spi"),
        F.sum(F.expr("(pi4 * (10000 - di4) + 5000) div 10000")).alias("sdpi"),
        F.sum(
            F.expr(
                "(pi4 * (10000 - di4) * (10000 + ti4) + 50000000)"
                " div 100000000"
            )
        ).alias("sci"),
        F.count("*").alias("count_order"),
    )
    ten_k = F.lit(10000.0)
    return grouped.select(
        "l_returnflag",
        "l_linestatus",
        (F.col("sqi").cast("double") / ten_k).alias("sum_qty"),
        (F.col("spi").cast("double") / ten_k).alias("sum_base_price"),
        (F.col("sdpi").cast("double") / ten_k).alias("sum_disc_price"),
        (F.col("sci").cast("double") / ten_k).alias("sum_charge"),
        (F.col("sqi").cast("double") / ten_k / F.col("count_order")).alias(
            "avg_qty"
        ),
        (F.col("spi").cast("double") / ten_k / F.col("count_order")).alias(
            "avg_price"
        ),
        "count_order",
    ).orderBy("l_returnflag", "l_linestatus")


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = ingest.load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == Q3_SEGMENT
    )
    orders = ingest.load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < Q3_DATE
    )
    li = ingest.load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > Q3_DATE
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy(
            "l_orderkey",
            F.unix_millis("o_orderdate").alias("o_orderdate_ms"),
            "o_orderpriority",
        )
        .agg(_rev_d().alias("revenue"))
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = ingest.load(spark, sf_dir, "region").filter(
        F.col("r_name") == Q5_REGION
    )
    nation = ingest.load(spark, sf_dir, "nation")
    cust = ingest.load(spark, sf_dir, "customer")
    orders = ingest.load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= Q5_YEAR_START)
        & (F.col("o_orderdate") < Q5_YEAR_END)
    )
    li = ingest.load(spark, sf_dir, "lineitem")
    supp = ingest.load(spark, sf_dir, "supplier")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(
            cust.join(
                F.broadcast(
                    nation.join(
                        F.broadcast(region),
                        nation.n_regionkey == region.r_regionkey,
                    )
                ),
                cust.c_nationkey == nation.n_nationkey,
            ),
            (orders.o_custkey == cust.c_custkey)
            & (supp.s_nationkey == cust.c_nationkey),
        )
        .groupBy("n_name")
        .agg(_rev_d().alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


def rollup_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ROLLUP — grouping-set capability beyond the reference."""
    li = ingest.load(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"))
        .orderBy("l_returnflag", "l_linestatus")
    )


def cube_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY CUBE — all grouping-set combinations."""
    li = ingest.load(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"))
        .orderBy("l_returnflag", "l_linestatus")
    )


def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS with grouping_id disambiguation (NULL group
    values vs real NULLs)."""
    li = ingest.load(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("_gs_lineitem")
    return spark.sql(
        f"""
        SELECT l_returnflag, l_linestatus,
               CAST(grouping(l_returnflag) AS INT) AS g_flag,
               CAST(grouping(l_linestatus) AS INT) AS g_status,
               CAST(sum(CAST(CAST(l_quantity AS {DEC}) * 10000 AS BIGINT))
                    AS DOUBLE) / 10000.0 AS sum_qty
        FROM _gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )


def topk_orders_per_priority(spark: SparkSession, sf_dir: str, k: int = 3) -> DataFrame:
    orders = ingest.load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), "o_orderkey"
    )
    return (
        orders.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("o_orderpriority", "rank", "o_orderkey", "o_totalprice")
        .orderBy("o_orderpriority", "rank")
    )


def except_high_balance_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operation (EXCEPT) — beyond-reference capability."""
    orders = ingest.load(spark, sf_dir, "orders")
    cust = ingest.load(spark, sf_dir, "customer")
    active = orders.select(F.col("o_custkey").alias("custkey")).distinct()
    rich = cust.filter(F.col("c_acctbal") > ACCTBAL_CUT).select(
        F.col("c_custkey").alias("custkey")
    )
    return active.exceptAll(rich.distinct()).orderBy("custkey")


def distinct_chatters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct chatters per channel (SURVEY §7.5) over the
    messages relation."""
    msgs = ingest.messages(spark, sf_dir)
    return msgs.groupBy("channel").agg(
        F.countDistinct("username").cast("long").alias("n_chatters")
    )


def approx_distinct_chatters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct made driver-checkable: the engine-specific
    estimate (default rsd 0.05) is folded into an in-plan integer bound
    check — 4*|est - exact| <= exact, i.e. within 25% (= 5x the
    configured relative standard deviation) — so the output is fully
    deterministic (exact count + boolean) while the sketch still runs.

    COST INVERSION, by design (ADVICE r6 #5): the exact countDistinct
    and the join exist ONLY to verify the estimate, which makes this
    VERIFICATION HARNESS strictly more expensive than the plain
    ``distinct_chatters`` query — its bench timing measures the harness,
    not the sketch's scale story (at 100 TB you would run the sketch
    alone and skip the exact side entirely). Residual bound-failure
    probability at the 5σ margin: ~3e-7 per channel at Gaussian tails
    (VERDICT r7 #8 — the old 3σ bound left ~2.7e-3, a deterministic
    flake waiting for a tail estimate at a new scale factor); at gate
    cardinalities the estimate sits in HLL++'s exact sparse range, so
    the observed probability is ~0 and a genuinely broken sketch path
    (whole multiples off, not percent) still reds the gate.

    -> channel, n_chatters, within_bound
    """
    msgs = ingest.messages(spark, sf_dir)
    est = msgs.groupBy("channel").agg(
        F.approx_count_distinct("username").alias("approx_chatters")
    )
    exact = msgs.groupBy("channel").agg(
        F.countDistinct("username").cast("long").alias("n_chatters")
    )
    return (
        exact.join(est, "channel")
        .select(
            "channel",
            "n_chatters",
            (
                F.abs(F.col("approx_chatters") - F.col("n_chatters")) * 4
                <= F.col("n_chatters")
            ).alias("within_bound"),
        )
        .orderBy("channel")
    )


EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def percentile_order_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median / p90 of order value per priority — Spark's exact
    ``percentile`` (sort-based, linear interpolation at rank
    ``1 + p*(n-1)``), the same definition as ANSI ``percentile_cont``
    that DuckDB's ``quantile_cont`` implements.

    Scale note: exact percentile shuffles each group's values; at
    100 TB swap in ``approx_percentile`` (t-digest, partial-mergeable,
    one pass) — shape kept here exact so the oracle can verify the
    arithmetic.
    """
    orders = ingest.load(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.expr("percentile(o_totalprice, 0.5D)").alias("median_price"),
        F.expr("percentile(o_totalprice, 0.9D)").alias("p90_price"),
        F.count("*").alias("n_orders"),
    )


def pivot_event_type_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: events reshaped to one row per day with one count column
    per event type. The value list is explicit, so the plan is a single
    partial-aggregated groupBy (no second pass to discover columns) —
    the only pivot shape that scales.

    -> day_ms, click, error, purchase, signup, view
    """
    ev = ingest.load(spark, sf_dir, "events")
    return (
        ev.withColumn(
            "day_ms", F.unix_millis(F.date_trunc("day", F.col("ts")))
        )
        .groupBy("day_ms")
        .pivot("event_type", EVENT_TYPES)
        .count()
        .na.fill(0, EVENT_TYPES)
    )


def unpivot_event_type_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt — the inverse reshaping of
    :func:`pivot_event_type_daily`: the wide per-day table back to one
    (day, event_type, n) row per cell, zero cells included. ``unpivot``
    is a pure projection (each input row expands to a fixed 5 rows) —
    no shuffle beyond the upstream pivot's.

    -> day_ms, event_type, n
    """
    wide = pivot_event_type_daily(spark, sf_dir)
    return wide.unpivot("day_ms", EVENT_TYPES, "event_type", "n")


def intersect_repeat_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-op INTERSECT: customers who placed orders in BOTH 1995 and
    1996 (completes the set-op family next to EXCEPT/UNION elsewhere).
    Catalyst plans INTERSECT as a left-semi join over pre-aggregated
    sides — no row explosion.

    -> custkey
    """
    orders = ingest.load(spark, sf_dir, "orders")
    by_year = lambda y: orders.filter(  # noqa: E731
        F.year("o_orderdate") == y
    ).select(F.col("o_custkey").alias("custkey"))
    return by_year(1995).intersect(by_year(1996))


Q7_SUPP_NATION = "NATION_1"
Q7_CUST_NATION = "NATION_2"
Q7_YEARS = (1996, 1997)
Q10_START = "1996-01-01 00:00:00"
Q10_END = "1996-04-01 00:00:00"
Q2_PART_SIZE = 50


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q7 shape: revenue shipped from one nation's suppliers to another
    nation's customers, by ship year. Two dim-filtered broadcast sides
    into the fact; the only lineitem shuffle is the final group-by.

    -> supp_nation, cust_nation, l_year, revenue
    """
    nation = ingest.load(spark, sf_dir, "nation")
    supp = (
        ingest.load(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nation.filter(F.col("n_name") == Q7_SUPP_NATION)),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    cust = (
        ingest.load(spark, sf_dir, "customer")
        .join(
            F.broadcast(nation.filter(F.col("n_name") == Q7_CUST_NATION)),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey")
    )
    orders = ingest.load(spark, sf_dir, "orders").join(
        cust, F.col("o_custkey") == F.col("c_custkey")
    )
    li = ingest.load(spark, sf_dir, "lineitem").filter(
        F.year("l_shipdate").isin(*Q7_YEARS)
    )
    return (
        li.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.year("l_shipdate").alias("l_year"))
        .agg(_rev_d().alias("revenue"))
        .select(
            F.lit(Q7_SUPP_NATION).alias("supp_nation"),
            F.lit(Q7_CUST_NATION).alias("cust_nation"),
            "l_year",
            "revenue",
        )
    )


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q10 shape: customers who returned items in a quarter, ranked by
    lost revenue, top 20 (TakeOrderedAndProject after the group-by).

    -> c_custkey, c_name, n_name, c_acctbal, revenue
    """
    orders = ingest.load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= Q10_START) & (F.col("o_orderdate") < Q10_END)
    )
    li = ingest.load(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    cust = ingest.load(spark, sf_dir, "customer").join(
        F.broadcast(ingest.load(spark, sf_dir, "nation")),
        F.col("c_nationkey") == F.col("n_nationkey"),
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        .agg(_rev_d().alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q19 shape: OR-of-ANDs predicate across the part-lineitem join.
    Catalyst extracts the common join key and pushes the per-table
    conjuncts below the join (p_brand/p_size to the part scan,
    l_quantity to the lineitem scan via the OR-simplification).

    -> revenue (one row)
    """
    part = ingest.load(spark, sf_dir, "part")
    li = ingest.load(spark, sf_dir, "lineitem")
    cond1 = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 30)
    )
    cond2 = (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(10, 40)
    )
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond1 | cond2)
        .agg(_rev_d().alias("revenue"))
    )


def q2_min_acctbal_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q2 shape (adapted — no partsupp table in the testdata): for each
    part of the target size, the supplier with the minimum account
    balance among suppliers who ever shipped it, ties broken by min
    suppkey. The correlated-min subquery decorrelates to an aggregate
    joined back on (part, min balance) — two shuffles on l_partkey,
    no window over the fact.

    -> p_partkey, p_brand, s_suppkey, s_acctbal
    """
    part = ingest.load(spark, sf_dir, "part").filter(
        F.col("p_size") == Q2_PART_SIZE
    )
    assoc = (
        ingest.load(spark, sf_dir, "lineitem")
        .join(
            part,
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select("p_partkey", "p_brand", "l_suppkey")
        .distinct()
    )
    joined = assoc.join(
        ingest.load(spark, sf_dir, "supplier"),
        F.col("l_suppkey") == F.col("s_suppkey"),
    )
    best = joined.groupBy("p_partkey").agg(
        F.min("s_acctbal").alias("s_acctbal")
    )
    return (
        joined.join(best, ["p_partkey", "s_acctbal"])
        .groupBy("p_partkey", "p_brand", "s_acctbal")
        .agg(F.min("s_suppkey").alias("s_suppkey"))
        .select("p_partkey", "p_brand", "s_suppkey", "s_acctbal")
    )


Q6_START = "1996-01-01 00:00:00"
Q6_END = "1997-01-01 00:00:00"
Q8_REGION = "ASIA"
Q8_NATION = "NATION_1"
Q8_PART_SIZE_MAX = 15
Q12_LATE_DAYS = 60
Q12_HIGH = ("1-URGENT", "2-HIGH")
Q15_START = "1996-01-01 00:00:00"
Q15_END = "1996-04-01 00:00:00"
Q21_LATE_DAYS = 90


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q6 shape: single-table scan under a tight conjunctive predicate
    with a global sum — the canonical predicate-pushdown/row-group-skip
    probe. All four predicates reach the parquet scan (shipdate min/max
    skips whole row groups); the aggregate is partial/final with a
    one-row shuffle.

    -> revenue
    """
    li = ingest.load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= Q6_START)
        & (F.col("l_shipdate") < Q6_END)
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    disc_rev_i4 = F.expr(
        f"({_i4_sql('l_extendedprice')} * {_i4_sql('l_discount')}"
        " + 5000) div 10000"
    )
    return li.agg(
        (F.sum(disc_rev_i4).cast("double") / F.lit(10000.0)).alias("revenue")
    )


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q8 shape (adapted: the share is keyed on the supplier's nation
    and the part filter is on p_size — the testdata has no p_type
    taxonomy worth filtering): for customers in region ASIA buying
    small parts, the fraction of yearly revenue supplied by NATION_1.

    Five joins, but lineitem never shuffles for any of them: part,
    supplier+nation, and customer+nation+region all broadcast; the only
    shuffle is the final group-by on year. The ratio is one IEEE divide
    of two exact ×10⁴ int64 sums emitted via the correctly-rounded
    int64→double conversion (portable across engines).

    -> o_year, mkt_share
    """
    part = ingest.load(spark, sf_dir, "part").filter(
        F.col("p_size") <= Q8_PART_SIZE_MAX
    )
    nation = ingest.load(spark, sf_dir, "nation")
    region = ingest.load(spark, sf_dir, "region").filter(
        F.col("r_name") == Q8_REGION
    )
    cust_in_region = (
        ingest.load(spark, sf_dir, "customer")
        .join(
            F.broadcast(
                nation.join(
                    F.broadcast(region),
                    nation.n_regionkey == region.r_regionkey,
                )
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey")
    )
    supp_nation = ingest.load(spark, sf_dir, "supplier").join(
        F.broadcast(nation.select("n_nationkey", F.col("n_name").alias("supp_nation"))),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "supp_nation")
    li = ingest.load(spark, sf_dir, "lineitem")
    orders = ingest.load(spark, sf_dir, "orders")
    vol_i4 = F.expr(_REV_I4_SPARK)
    joined = (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust_in_region, F.col("o_custkey") == F.col("c_custkey"))
        .join(supp_nation, F.col("l_suppkey") == F.col("s_suppkey"))
    )
    grouped = joined.groupBy(F.year("o_orderdate").cast("int").alias("o_year")).agg(
        F.sum(
            F.when(F.col("supp_nation") == Q8_NATION, vol_i4).otherwise(
                F.lit(0).cast("long")
            )
        ).alias("nation_vol"),
        F.sum(vol_i4).alias("total_vol"),
    )
    return grouped.select(
        "o_year",
        (
            F.col("nation_vol").cast("double") / F.col("total_vol").cast("double")
        ).alias("mkt_share"),
    ).orderBy("o_year")


def q12_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q12 shape (adapted: the testdata has no l_shipmode/l_commitdate,
    so the group key is a derived lateness bucket — shipped more than
    60 days after the order date): per bucket, how many lineitems
    belong to high- vs low-priority orders. Join + CASE conditional
    aggregation; orders broadcasts nothing — both sides are large, so
    this is the one intentionally shuffling join in the family (hash
    on orderkey), which is also how it must run at 100 TB.

    -> bucket, high_line_count, low_line_count
    """
    li = ingest.load(spark, sf_dir, "lineitem")
    orders = ingest.load(spark, sf_dir, "orders")
    high = F.when(F.col("o_orderpriority").isin(*Q12_HIGH), 1).otherwise(0)
    bucket = F.when(
        F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > Q12_LATE_DAYS,
        "LATE",
    ).otherwise("ONTIME")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(bucket.alias("bucket"))
        .agg(
            F.sum(high).alias("high_line_count"),
            F.sum(1 - high).alias("low_line_count"),
        )
        .orderBy("bucket")
    )


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q15 shape: revenue per supplier over a quarter, then the
    supplier(s) whose revenue equals the maximum — the classic
    view + scalar-subquery-max pattern. The max is a one-row aggregate
    broadcast back onto the per-supplier revenues; the equality
    comparison happens on the exact ×10⁴ int64 sums
    (order-independent), so ties and the winner are deterministic
    across engines.

    -> s_suppkey, s_name, total_revenue
    """
    li = ingest.load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= Q15_START) & (F.col("l_shipdate") < Q15_END)
    )
    revenue = li.groupBy("l_suppkey").agg(
        F.sum(F.expr(_REV_I4_SPARK)).alias("rev")
    )
    max_rev = revenue.agg(F.max("rev").alias("max_rev"))
    return (
        revenue.join(F.broadcast(max_rev), F.col("rev") == F.col("max_rev"))
        .join(
            ingest.load(spark, sf_dir, "supplier"),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select(
            "s_suppkey",
            "s_name",
            (F.col("rev").cast("double") / F.lit(10000.0)).alias(
                "total_revenue"
            ),
        )
        .orderBy("s_suppkey")
    )


def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q21 shape (adapted: "late" = shipped more than 90 days after the
    order date, since the testdata has no commit/receipt dates):
    suppliers with a late lineitem in a finished multi-supplier order
    where every OTHER supplier shipped on time. The reference EXISTS /
    NOT EXISTS pair becomes a semi join against the distinct
    (order, supplier) pairs and an anti join against the late pairs —
    both pair sets are aggregates far smaller than lineitem, and the
    semi/anti probes hash-shuffle on l_orderkey only.

    -> s_name, numwait
    """
    orders = ingest.load(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    li = ingest.load(spark, sf_dir, "lineitem").join(
        orders.select("o_orderkey", "o_orderdate"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    late = li.filter(
        F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > Q21_LATE_DAYS
    )
    pairs = li.select("l_orderkey", "l_suppkey").distinct()
    late_pairs = late.select("l_orderkey", "l_suppkey").distinct()
    l1 = late.select(
        F.col("l_orderkey").alias("okey"), F.col("l_suppkey").alias("skey")
    )
    sibling = pairs.select(
        F.col("l_orderkey").alias("okey"), F.col("l_suppkey").alias("sib_skey")
    )
    late_sibling = late_pairs.select(
        F.col("l_orderkey").alias("okey"), F.col("l_suppkey").alias("lsib_skey")
    )
    qualified = (
        l1.join(
            sibling,
            (l1.okey == sibling.okey) & (F.col("skey") != F.col("sib_skey")),
            "left_semi",
        )
        .join(
            late_sibling,
            (l1.okey == late_sibling.okey)
            & (F.col("skey") != F.col("lsib_skey")),
            "left_anti",
        )
    )
    return (
        qualified.join(
            ingest.load(spark, sf_dir, "supplier"),
            F.col("skey") == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


Q4_START = "1996-01-01 00:00:00"
Q4_END = "1996-04-01 00:00:00"
Q9_NAME_FRAG = "red"
Q9_COST_RATE = "0.1"  # cost proxy: 10% of retail price per unit
Q11_NATIONKEY_MAX = 5
Q11_FRACTION_INV = 1000  # threshold = total/1000
Q13_EXCLUDED_PRIORITY = "1-URGENT"
Q14_START = "1996-01-01 00:00:00"
Q14_END = "1996-02-01 00:00:00"
Q16_EXCLUDED_BRAND = "Brand#1"
Q16_SIZES = [1, 5, 10, 15, 20, 25, 30, 35]
Q17_BRAND = "Brand#23"
Q18_MIN_QTY = 250
Q20_NAME_PREFIX = "red"
Q20_MIN_QTY = 50
Q20_START = "1996-01-01 00:00:00"
Q20_END = "1997-01-01 00:00:00"
Q22_DORMANT_CUTOFF = "2000-01-01 00:00:00"


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q4 shape (adapted: "late line" = shipped after the order date,
    since the testdata has no commitdate): count of orders per priority
    in a quarter having at least one late lineitem. The EXISTS becomes
    a left-semi join — the probe shuffles on the join key only and the
    non-equi shipdate conjunct rides along as a join condition, so no
    row amplification ever materializes.

    -> o_orderpriority, order_count
    """
    orders = ingest.load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= Q4_START) & (F.col("o_orderdate") < Q4_END)
    )
    li = ingest.load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q9 shape (adapted: no partsupp/ps_supplycost in the testdata —
    unit cost proxied as 10% of p_retailprice): profit by supplier
    nation and order year over parts whose name contains a fragment.
    part/supplier/nation broadcast into lineitem; the one big-big join
    (lineitem⋈orders for the year) shuffles on orderkey; the group-by
    is partial-aggregated to |nations × years| rows per task.

    Determinism (float sweep, round 7): the old DECIMAL(18,4) triple
    product overflowed 38-digit precision, where Spark and DuckDB clip
    scale DIFFERENTLY, so the final DOUBLE cast mismatched by one ulp.
    Money columns are 2-decimal by construction, so the profit is now
    pure integer arithmetic in 1e-4 units — exact and order-free:
    ``le_c2*(100-disc_c2) - rp_c2*qty*10`` per row, summed as BIGINT.

    -> n_name, o_year, profit_e4
    """
    part = ingest.load(spark, sf_dir, "part").filter(
        F.col("p_name").contains(Q9_NAME_FRAG)
    )
    supp = ingest.load(spark, sf_dir, "supplier")
    nation = ingest.load(spark, sf_dir, "nation")
    orders = ingest.load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    li = ingest.load(spark, sf_dir, "lineitem")
    le_c2 = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    disc_c2 = F.round(F.col("l_discount") * 100, 0).cast("long")
    rp_c2 = F.round(F.col("p_retailprice") * 100, 0).cast("long")
    qty = F.col("l_quantity").cast("long")
    amount = F.sum(
        le_c2 * (F.lit(100) - disc_c2) - rp_c2 * qty * F.lit(10)
    )
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("n_name", F.year("o_orderdate").alias("o_year"))
        .agg(amount.cast("long").alias("profit_e4"))
        .orderBy("n_name", F.desc("o_year"))
    )


def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q11 shape (adapted: part "value" = lineitem extended price
    shipped by suppliers of the low-key nations, standing in for
    ps_supplycost*ps_availqty): parts whose value exceeds 1/1000 of
    the global total. The scalar subquery is a one-row broadcast
    (cross join) over the already-aggregated per-part values — the
    fact is scanned once; the threshold compare is exact decimal
    (value*1000 > total), immune to float nondeterminism.

    -> partkey, value
    """
    supp = ingest.load(spark, sf_dir, "supplier").filter(
        F.col("s_nationkey") < Q11_NATIONKEY_MAX
    )
    li = ingest.load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    per_part = (
        li.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum(_i4("l_extendedprice")).alias("val"))
    )
    total = per_part.agg(F.sum("val").alias("total"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("val") * Q11_FRACTION_INV > F.col("total"))
        .select(
            "partkey",
            (F.col("val").cast("double") / F.lit(10000.0)).alias("value"),
        )
        .orderBy(F.desc("value"), "partkey")
    )


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q13 shape: distribution of order counts per customer, orders
    filtered inside the join (priority exclusion standing in for the
    comment LIKE filter — the testdata has no o_comment). Left outer
    join so zero-order customers land in the c_count=0 bucket; the
    second aggregation is over ≤|customers| rows.

    -> c_count, custdist
    """
    cust = ingest.load(spark, sf_dir, "customer").select("c_custkey")
    per_cust = (
        ingest.load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != Q13_EXCLUDED_PRIORITY)
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n"))
    )
    return (
        cust.join(per_cust, cust.c_custkey == per_cust.o_custkey, "left")
        .select(F.coalesce(F.col("n"), F.lit(0)).alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q14 shape: conditional-aggregate ratio — share of one month's
    revenue from PROMO-type parts. Part broadcasts into the
    month-pruned lineitem scan; one pass, two decimal sums, the ratio
    taken in double only at the end.

    -> promo_revenue (one row)
    """
    li = ingest.load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= Q14_START) & (F.col("l_shipdate") < Q14_END)
    )
    part = ingest.load(spark, sf_dir, "part").select("p_partkey", "p_type")
    disc_i4 = F.expr(_REV_I4_SPARK)
    promo_i4 = F.when(F.col("p_type") == "PROMO", disc_i4).otherwise(
        F.lit(0).cast("long")
    )
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.sum(promo_i4).alias("p"),
            F.sum(disc_i4).alias("t"),
        )
        .select(
            (
                F.lit(100.0) * F.col("p").cast("double")
                / F.col("t").cast("double")
            ).alias("promo_revenue")
        )
    )


def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q16 shape (adapted: the supplier "complaints" NOT IN subquery
    keys on negative account balance — no s_comment in the testdata;
    supplier-part association comes from lineitem — no partsupp):
    distinct supplier count per (brand, type, size) for a size IN-list
    with one brand excluded. The NOT IN is an anti join against a tiny
    broadcast side; count(DISTINCT) shuffles once on the group keys
    with the suppkey de-dup handled by the two-phase distinct
    aggregate.

    -> p_brand, p_type, p_size, supplier_cnt
    """
    part = ingest.load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != Q16_EXCLUDED_BRAND)
        & F.col("p_size").isin(Q16_SIZES)
    )
    bad_supp = ingest.load(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    li = ingest.load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey"
    )
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(
            bad_supp,
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q17 shape: revenue from lineitems of one brand's parts whose
    quantity is below 20% of that part's average quantity. The
    correlated AVG decorrelates to a per-part aggregate joined back on
    partkey; the comparison is restated exactly in integers-free
    decimal arithmetic (5·qty·cnt < sum_qty ⟺ qty < 0.2·avg), so both
    engines decide each row identically — no float threshold wobble.

    -> avg_yearly (one row)
    """
    li = ingest.load(spark, sf_dir, "lineitem")
    part = ingest.load(spark, sf_dir, "part").filter(
        F.col("p_brand") == Q17_BRAND
    ).select("p_partkey")
    per_part = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(_dec("l_quantity")).alias("sq"), F.count("*").alias("cnt")
    )
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(per_part, F.col("l_partkey") == F.col("pk"))
        .filter(
            F.lit(5).cast(DEC) * _dec("l_quantity") * F.col("cnt")
            < F.col("sq")
        )
        .agg((_sum_d4("l_extendedprice") / F.lit(7.0)).alias("avg_yearly"))
    )


def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q18 shape: orders whose total quantity exceeds a threshold,
    with customer attribution, top 100 by price. The HAVING subquery
    and the outer per-order sum are the same aggregate, so it is
    computed once (single lineitem shuffle on orderkey) and joined to
    orders — no second pass over the fact as in the textbook SQL.

    -> c_name, c_custkey, o_orderkey, o_orderdate_ms, o_totalprice, total_qty
    """
    big = (
        ingest.load(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.sum(_i4("l_quantity")).alias("sq"))
        .filter(F.col("sq") > F.lit(Q18_MIN_QTY * 10000))
    )
    orders = ingest.load(spark, sf_dir, "orders")
    cust = ingest.load(spark, sf_dir, "customer").select(
        "c_custkey", "c_name"
    )
    return (
        big.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.unix_millis("o_orderdate").alias("o_orderdate_ms"),
            "o_totalprice",
            (F.col("sq").cast("double") / F.lit(10000.0)).alias("total_qty"),
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


def q20_excess_inventory_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q20 shape (adapted: "excess availability" = shipped more than a
    threshold quantity of a prefix-named part within the year, since
    the testdata has no partsupp.availqty): suppliers having such a
    part-association. Both nested INs collapse into one aggregate of
    lineitem grouped by (part, supplier) — filtered by a broadcast
    semi join on the part prefix — then a semi join into supplier.

    -> s_suppkey, s_name
    """
    part = ingest.load(spark, sf_dir, "part").filter(
        F.col("p_name").startswith(Q20_NAME_PREFIX)
    ).select("p_partkey")
    shipped = (
        ingest.load(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= Q20_START) & (F.col("l_shipdate") < Q20_END)
        )
        .join(part, F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(_dec("l_quantity")).alias("sq"))
        .filter(F.col("sq") > F.lit(Q20_MIN_QTY).cast(DEC))
        .select("l_suppkey")
        .distinct()
    )
    return (
        ingest.load(spark, sf_dir, "supplier")
        .join(shipped, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


def q22_dormant_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q22 shape (adapted: "no orders" would be empty — every testdata
    customer has orders — so dormancy means no orders after a cutoff;
    the phone-prefix country code becomes c_nationkey): count and
    total balance of above-average-balance dormant customers per
    nation. The global AVG is a one-row broadcast; the compare is
    restated exactly in decimal (bal·cnt > sum ⟺ bal > avg); the NOT
    EXISTS is an anti join against the cutoff-filtered orders.

    -> c_nationkey, numcust, totacctbal
    """
    cust = ingest.load(spark, sf_dir, "customer")
    pos = cust.filter(F.col("c_acctbal") > 0).agg(
        F.sum(_dec("c_acctbal")).alias("s"), F.count("*").alias("n")
    )
    recent = ingest.load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= Q22_DORMANT_CUTOFF
    ).select("o_custkey")
    return (
        cust.crossJoin(F.broadcast(pos))
        .filter(_dec("c_acctbal") * F.col("n") > F.col("s"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            _sum_d4("c_acctbal").alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


TPCH_QUERIES = {
    "tpch_q1_pricing_summary": q1_pricing_summary,
    "tpch_q7_volume_shipping": q7_volume_shipping,
    "tpch_q10_returned_items": q10_returned_items,
    "tpch_q19_disjunctive_revenue": q19_disjunctive_revenue,
    "tpch_q2_min_acctbal_supplier": q2_min_acctbal_supplier,
    "tpch_q3_shipping_priority": q3_shipping_priority,
    "tpch_q5_local_supplier_volume": q5_local_supplier_volume,
    "tpch_q6_forecast_revenue": q6_forecast_revenue,
    "tpch_q8_market_share": q8_market_share,
    "tpch_q12_late_shipment_priority": q12_late_shipment_priority,
    "tpch_q15_top_supplier": q15_top_supplier,
    "tpch_q21_waiting_suppliers": q21_waiting_suppliers,
    "tpch_q4_order_priority": q4_order_priority,
    "tpch_q9_product_type_profit": q9_product_type_profit,
    "tpch_q11_important_parts": q11_important_parts,
    "tpch_q13_customer_distribution": q13_customer_distribution,
    "tpch_q14_promo_revenue": q14_promo_revenue,
    "tpch_q16_supplier_part_counts": q16_supplier_part_counts,
    "tpch_q17_small_quantity_revenue": q17_small_quantity_revenue,
    "tpch_q18_large_volume_customers": q18_large_volume_customers,
    "tpch_q20_excess_inventory_suppliers": q20_excess_inventory_suppliers,
    "tpch_q22_dormant_rich_customers": q22_dormant_rich_customers,
    "rollup_order_counts": rollup_order_counts,
    "cube_order_counts": cube_order_counts,
    "grouping_sets_revenue": grouping_sets_revenue,
    "topk_orders_per_priority": topk_orders_per_priority,
    "except_high_balance_customers": except_high_balance_customers,
    "distinct_chatters": distinct_chatters,
    "approx_distinct_chatters": approx_distinct_chatters,
    "percentile_order_values": percentile_order_values,
    "pivot_event_type_daily": pivot_event_type_daily,
    "intersect_repeat_customers": intersect_repeat_customers,
    "unpivot_event_type_daily": unpivot_event_type_daily,
}


def tpch_oracles() -> dict[str, str]:
    from ..registry import chat_ctes

    return {
        "tpch_q7_volume_shipping": f"""
SELECT '{Q7_SUPP_NATION}' AS supp_nation, '{Q7_CUST_NATION}' AS cust_nation,
       CAST(year(l_shipdate) AS INT) AS l_year,
       {REV_D_SQL}
           AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ns ON s_nationkey = ns.n_nationkey AND ns.n_name = '{Q7_SUPP_NATION}'
JOIN customer ON o_custkey = c_custkey
JOIN nation nc ON c_nationkey = nc.n_nationkey AND nc.n_name = '{Q7_CUST_NATION}'
WHERE year(l_shipdate) IN ({Q7_YEARS[0]}, {Q7_YEARS[1]})
GROUP BY 3""",
        "tpch_q10_returned_items": f"""
SELECT c_custkey, c_name, n_name, c_acctbal,
       {REV_D_SQL}
           AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '{Q10_START}'
  AND o_orderdate < TIMESTAMP '{Q10_END}'
GROUP BY 1, 2, 3, 4
ORDER BY revenue DESC, c_custkey LIMIT 20""",
        "tpch_q19_disjunctive_revenue": f"""
SELECT {REV_D_SQL}
           AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 30)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
       AND l_quantity BETWEEN 10 AND 40)""",
        "tpch_q2_min_acctbal_supplier": f"""
WITH assoc AS (
    SELECT DISTINCT p_partkey, p_brand, l_suppkey
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_size = {Q2_PART_SIZE}
),
joined AS (
    SELECT a.p_partkey, a.p_brand, s.s_suppkey, s.s_acctbal
    FROM assoc a JOIN supplier s ON a.l_suppkey = s.s_suppkey
),
best AS (
    SELECT p_partkey, min(s_acctbal) AS s_acctbal FROM joined GROUP BY 1
)
SELECT j.p_partkey, j.p_brand,
       min(j.s_suppkey) AS s_suppkey, j.s_acctbal
FROM joined j JOIN best USING (p_partkey, s_acctbal)
GROUP BY j.p_partkey, j.p_brand, j.s_acctbal""",
        "tpch_q1_pricing_summary": f"""
WITH ints AS (
    -- scaled-int twin of the Spark plan: quantize to DECIMAL(18,4),
    -- extract the exact ×10⁴ integer, keep ALL math in int64 so the
    -- final int64→double conversion is correctly rounded identically
    -- in both engines (decimal-sum→DOUBLE is 1-ulp nonportable)
    SELECT l_returnflag, l_linestatus,
           CAST(CAST(l_quantity AS DECIMAL(18,4)) * 10000 AS BIGINT) AS qi4,
           CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * 10000 AS BIGINT) AS pi4,
           CAST(CAST(l_discount AS DECIMAL(18,4)) * 10000 AS BIGINT) AS di4,
           CAST(CAST(l_tax AS DECIMAL(18,4)) * 10000 AS BIGINT) AS ti4
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '{Q1_CUTOFF}'
)
SELECT l_returnflag, l_linestatus,
    CAST(CAST(sum(qi4) AS BIGINT) AS DOUBLE) / 10000.0 AS sum_qty,
    CAST(CAST(sum(pi4) AS BIGINT) AS DOUBLE) / 10000.0 AS sum_base_price,
    CAST(CAST(sum((pi4 * (10000 - di4) + 5000) // 10000) AS BIGINT)
         AS DOUBLE) / 10000.0 AS sum_disc_price,
    CAST(CAST(sum((pi4 * (10000 - di4) * (10000 + ti4) + 50000000)
                  // 100000000) AS BIGINT) AS DOUBLE) / 10000.0 AS sum_charge,
    CAST(CAST(sum(qi4) AS BIGINT) AS DOUBLE) / 10000.0 / count(*) AS avg_qty,
    CAST(CAST(sum(pi4) AS BIGINT) AS DOUBLE) / 10000.0 / count(*) AS avg_price,
    count(*) AS count_order
FROM ints
GROUP BY l_returnflag, l_linestatus""",
        "tpch_q3_shipping_priority": f"""
SELECT l_orderkey, epoch_ms(o_orderdate) AS o_orderdate_ms, o_orderpriority,
    {REV_D_SQL}
        AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = '{Q3_SEGMENT}'
  AND o_orderdate < TIMESTAMP '{Q3_DATE}'
  AND l_shipdate > TIMESTAMP '{Q3_DATE}'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, l_orderkey LIMIT 10""",
        "tpch_q5_local_supplier_volume": f"""
SELECT n_name,
    {REV_D_SQL}
        AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey AND s_nationkey = c_nationkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = '{Q5_REGION}'
  AND o_orderdate >= TIMESTAMP '{Q5_YEAR_START}'
  AND o_orderdate < TIMESTAMP '{Q5_YEAR_END}'
GROUP BY n_name""",
        "tpch_q6_forecast_revenue": f"""
SELECT CAST(CAST(sum(({_i4_sql('l_extendedprice')}
         * {_i4_sql('l_discount')} + 5000) // 10000) AS BIGINT)
       AS DOUBLE) / 10000.0 AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{Q6_START}'
  AND l_shipdate < TIMESTAMP '{Q6_END}'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24""",
        "tpch_q8_market_share": f"""
SELECT CAST(year(o_orderdate) AS INT) AS o_year,
       CAST(CAST(sum(CASE WHEN sn.n_name = '{Q8_NATION}'
                THEN {_REV_I4_DUCK}
                ELSE 0 END) AS BIGINT) AS DOUBLE)
       / CAST(CAST(sum({_REV_I4_DUCK}) AS BIGINT) AS DOUBLE)
           AS mkt_share
FROM lineitem
JOIN part ON l_partkey = p_partkey AND p_size <= {Q8_PART_SIZE_MAX}
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN region ON cn.n_regionkey = r_regionkey AND r_name = '{Q8_REGION}'
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
GROUP BY 1""",
        "tpch_q12_late_shipment_priority": f"""
SELECT CASE WHEN date_diff('day', o_orderdate, l_shipdate) > {Q12_LATE_DAYS}
            THEN 'LATE' ELSE 'ONTIME' END AS bucket,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1""",
        "tpch_q15_top_supplier": f"""
WITH revenue AS (
    SELECT l_suppkey, CAST(sum({_REV_I4_DUCK}) AS BIGINT) AS rev
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '{Q15_START}'
      AND l_shipdate < TIMESTAMP '{Q15_END}'
    GROUP BY 1
)
SELECT s_suppkey, s_name,
       CAST(rev AS DOUBLE) / 10000.0 AS total_revenue
FROM revenue JOIN supplier ON l_suppkey = s_suppkey
WHERE rev = (SELECT max(rev) FROM revenue)""",
        "tpch_q21_waiting_suppliers": f"""
WITH li AS (
    SELECT l_orderkey, l_suppkey,
           date_diff('day', o_orderdate, l_shipdate) > {Q21_LATE_DAYS} AS is_late
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderstatus = 'F'
)
SELECT s_name, count(*) AS numwait
FROM li l1 JOIN supplier ON l1.l_suppkey = s_suppkey
WHERE l1.is_late
  AND EXISTS (SELECT 1 FROM li l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM li l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey AND l3.is_late)
GROUP BY s_name
ORDER BY numwait DESC, s_name LIMIT 20""",
        "tpch_q4_order_priority": f"""
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '{Q4_START}'
  AND o_orderdate < TIMESTAMP '{Q4_END}'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
ORDER BY o_orderpriority""",
        "tpch_q9_product_type_profit": f"""
SELECT n_name, CAST(year(o_orderdate) AS INT) AS o_year,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l_discount * 100) AS BIGINT))
                - CAST(round(p_retailprice * 100) AS BIGINT)
                  * CAST(l_quantity AS BIGINT) * 10)
            AS BIGINT) AS profit_e4
FROM lineitem
JOIN part ON l_partkey = p_partkey AND p_name LIKE '%{Q9_NAME_FRAG}%'
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1, 2""",
        "tpch_q11_important_parts": f"""
WITH v AS (
    SELECT l_partkey AS partkey,
           CAST(sum({_i4_sql('l_extendedprice')}) AS BIGINT) AS val
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    WHERE s_nationkey < {Q11_NATIONKEY_MAX}
    GROUP BY 1
)
SELECT partkey, CAST(val AS DOUBLE) / 10000.0 AS value
FROM v
WHERE val * {Q11_FRACTION_INV} > (SELECT sum(val) FROM v)""",
        "tpch_q13_customer_distribution": f"""
SELECT c_count, count(*) AS custdist
FROM (
    SELECT c_custkey, count(o_orderkey) AS c_count
    FROM customer LEFT JOIN orders
      ON c_custkey = o_custkey AND o_orderpriority <> '{Q13_EXCLUDED_PRIORITY}'
    GROUP BY c_custkey
)
GROUP BY c_count""",
        "tpch_q14_promo_revenue": f"""
SELECT 100.0 * CAST(CAST(sum(CASE WHEN p_type = 'PROMO'
           THEN {_REV_I4_DUCK}
           ELSE 0 END) AS BIGINT) AS DOUBLE)
       / CAST(CAST(sum({_REV_I4_DUCK}) AS BIGINT) AS DOUBLE)
           AS promo_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '{Q14_START}'
  AND l_shipdate < TIMESTAMP '{Q14_END}'""",
        "tpch_q16_supplier_part_counts": f"""
SELECT p_brand, p_type, p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> '{Q16_EXCLUDED_BRAND}'
  AND p_size IN ({", ".join(str(s) for s in Q16_SIZES)})
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3""",
        "tpch_q17_small_quantity_revenue": f"""
WITH pa AS (
    SELECT l_partkey AS pk, sum(CAST(l_quantity AS DECIMAL(18,4))) AS sq,
           count(*) AS cnt
    FROM lineitem GROUP BY 1
)
SELECT {SUM_D4_SQL('l_extendedprice')} / 7.0 AS avg_yearly
FROM lineitem
JOIN part ON l_partkey = p_partkey AND p_brand = '{Q17_BRAND}'
JOIN pa ON l_partkey = pk
WHERE CAST(5 AS DECIMAL(18,4)) * CAST(l_quantity AS DECIMAL(18,4)) * cnt < sq""",
        "tpch_q18_large_volume_customers": f"""
SELECT c_name, c_custkey, o_orderkey, epoch_ms(o_orderdate) AS o_orderdate_ms,
       o_totalprice, CAST(sq AS DOUBLE) / 10000.0 AS total_qty
FROM (
    SELECT l_orderkey, CAST(sum({_i4_sql('l_quantity')}) AS BIGINT) AS sq
    FROM lineitem GROUP BY 1
    HAVING sum({_i4_sql('l_quantity')}) > {Q18_MIN_QTY} * 10000
)
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""",
        "tpch_q20_excess_inventory_suppliers": f"""
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (
    SELECT l_suppkey
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE p_name LIKE '{Q20_NAME_PREFIX}%'
      AND l_shipdate >= TIMESTAMP '{Q20_START}'
      AND l_shipdate < TIMESTAMP '{Q20_END}'
    GROUP BY l_partkey, l_suppkey
    HAVING sum(CAST(l_quantity AS DECIMAL(18,4)))
           > CAST({Q20_MIN_QTY} AS DECIMAL(18,4))
)
ORDER BY s_suppkey""",
        "tpch_q22_dormant_rich_customers": f"""
WITH pos AS (
    SELECT sum(CAST(c_acctbal AS DECIMAL(18,4))) AS s, count(*) AS n
    FROM customer WHERE c_acctbal > 0
)
SELECT c_nationkey, count(*) AS numcust,
       {SUM_D4_SQL('c_acctbal')} AS totacctbal
FROM customer, pos
WHERE CAST(c_acctbal AS DECIMAL(18,4)) * n > s
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '{Q22_DORMANT_CUTOFF}')
GROUP BY c_nationkey""",
        "rollup_order_counts": """
SELECT l_returnflag, l_linestatus, count(*) AS n
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""",
        "cube_order_counts": """
SELECT l_returnflag, l_linestatus, count(*) AS n
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""",
        "grouping_sets_revenue": f"""
SELECT l_returnflag, l_linestatus,
       CAST(grouping(l_returnflag) AS INT) AS g_flag,
       CAST(grouping(l_linestatus) AS INT) AS g_status,
       {SUM_D4_SQL('l_quantity')} AS sum_qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())""",
        "topk_orders_per_priority": """
SELECT o_orderpriority, rank, o_orderkey, o_totalprice FROM (
    SELECT o_orderpriority, o_orderkey, o_totalprice,
           CAST(row_number() OVER (PARTITION BY o_orderpriority
               ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rank
    FROM orders
) WHERE rank <= 3""",
        "except_high_balance_customers": f"""
SELECT DISTINCT o_custkey AS custkey FROM orders
EXCEPT
SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > {ACCTBAL_CUT}""",
        "distinct_chatters": chat_ctes()
        + """
SELECT channel, CAST(count(DISTINCT username) AS BIGINT) AS n_chatters
FROM messages GROUP BY channel""",
        # estimate is engine-specific; the deterministic contract is
        # the exact count + the bound boolean (see the query docstring)
        "approx_distinct_chatters": chat_ctes()
        + """
SELECT channel, CAST(count(DISTINCT username) AS BIGINT) AS n_chatters,
       TRUE AS within_bound
FROM messages GROUP BY channel""",
        "percentile_order_values": """
SELECT o_orderpriority,
       quantile_cont(o_totalprice, 0.5) AS median_price,
       quantile_cont(o_totalprice, 0.9) AS p90_price,
       count(*) AS n_orders
FROM orders GROUP BY o_orderpriority""",
        "pivot_event_type_daily": """
SELECT epoch_ms(date_trunc('day', ts)) AS day_ms,
    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
    CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
    CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
    CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
FROM events GROUP BY 1""",
        "intersect_repeat_customers": """
SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1995
INTERSECT
SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1996""",
        "unpivot_event_type_daily": f"""
WITH days AS (
    SELECT DISTINCT epoch_ms(date_trunc('day', ts)) AS day_ms FROM events
),
types AS (SELECT unnest({EVENT_TYPES!r}) AS event_type),
counts AS (
    SELECT epoch_ms(date_trunc('day', ts)) AS day_ms, event_type,
           count(*) AS n
    FROM events GROUP BY 1, 2
)
SELECT d.day_ms, t.event_type, CAST(coalesce(c.n, 0) AS BIGINT) AS n
FROM days d CROSS JOIN types t
LEFT JOIN counts c USING (day_ms, event_type)""",
    }
