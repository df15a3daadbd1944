"""Correlated-subquery family (TPC-H q4/q13/q14/q17/q18/q22 shapes,
adapted to the testdata schema): EXISTS / NOT EXISTS, correlated scalar
subqueries, scalar-subquery thresholds, HAVING, and CASE-weighted ratio
aggregation.

The reference has no query language at all (SURVEY.md §2.D) — its "API"
is fixed REST routes over hand-written SQL with no subqueries. These
queries demonstrate the capability class Spark adds: Catalyst's
decorrelation rules rewrite every correlated subquery below into a
join — EXISTS → left-semi, NOT EXISTS → left-anti, a correlated scalar
aggregate → aggregate-then-join — so nothing executes per-row.

Scale notes (100 TB):
- EXISTS/NOT EXISTS become semi/anti hash joins on the correlation key:
  one shuffle of the (pre-filtered, pre-projected) subquery side, never
  a nested loop. The subquery side is filtered before the join, so the
  shuffle carries only qualifying keys.
- The correlated scalar aggregate (q17 shape) becomes a per-key
  aggregate of the inner table joined back to the outer — the inner agg
  is partial-aggregated map-side, so the shuffle is |distinct keys|.
- The q22-shape global scalar threshold is a one-row aggregate Catalyst
  evaluates once and injects as a literal-like filter — at scale that is
  a separate tiny job, not a per-row evaluation.
- q13's outer-join distribution double-aggregates: the second groupBy is
  over |customers| rows, already small relative to the fact table.

Float determinism: thresholds that feed comparisons are computed as
exact-decimal sums cast to DOUBLE then divided (sum exact and
order-independent; IEEE division correctly rounded → identical in
Spark and DuckDB). l_quantity is integer-valued, so its double avg is
sum/count of exact values — also engine-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import ingest

DEC = "decimal(18,4)"

EXISTS_QTY = 45
EXISTS_START = "1996-01-01 00:00:00"
EXISTS_END = "1996-04-01 00:00:00"
INACTIVE_SINCE = "2000-01-01 00:00:00"
Q17_BRAND = "Brand#23"
Q18_QTY = 150
Q14_START = "1996-03-01 00:00:00"
Q14_END = "1996-04-01 00:00:00"


def _register(spark: SparkSession, sf_dir: str, *tables: str) -> None:
    for t in tables:
        ingest.load(spark, sf_dir, t).createOrReplaceTempView(f"sq_{t}")


def exists_high_qty_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS correlated subquery (TPC-H q4 shape): orders in a quarter
    that contain at least one high-quantity line, counted per priority.
    Catalyst's RewritePredicateSubquery turns the EXISTS into a
    left-semi hash join on l_orderkey; the inner side is filtered to
    ``l_quantity > 45`` *before* the join, so only qualifying orderkeys
    shuffle.

    -> o_orderpriority, n_orders
    """
    _register(spark, sf_dir, "orders", "lineitem")
    return spark.sql(
        f"""
        SELECT o_orderpriority, count(*) AS n_orders
        FROM sq_orders
        WHERE o_orderdate >= TIMESTAMP '{EXISTS_START}'
          AND o_orderdate <  TIMESTAMP '{EXISTS_END}'
          AND EXISTS (SELECT 1 FROM sq_lineitem
                      WHERE l_orderkey = o_orderkey
                        AND l_quantity > {EXISTS_QTY})
        GROUP BY o_orderpriority
        """
    )


def not_exists_lapsed_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS + uncorrelated scalar-subquery threshold (TPC-H q22
    shape): above-average-balance customers with no order since a cutoff
    date, summarized per market segment. The NOT EXISTS decorrelates to
    a left-anti join on o_custkey; the average-balance threshold is a
    one-row subquery evaluated once.

    The above-average threshold is restated multiplicatively in exact
    scaled integers (balance·n > Σbalances) so row membership never
    depends on a float division; the emitted total goes through the
    correctly-rounded int64→double conversion on both engines.

    -> c_mktsegment, n_custs, total_bal
    """
    _register(spark, sf_dir, "customer", "orders")
    return spark.sql(
        f"""
        SELECT c_mktsegment, count(*) AS n_custs,
               CAST(sum(CAST(CAST(c_acctbal AS {DEC}) * 10000 AS BIGINT))
                    AS DOUBLE) / 10000.0 AS total_bal
        FROM sq_customer
        WHERE CAST(CAST(c_acctbal AS {DEC}) * 10000 AS BIGINT)
              * (SELECT count(*) FROM sq_customer WHERE c_acctbal > 0)
              > (SELECT sum(CAST(CAST(c_acctbal AS {DEC}) * 10000 AS BIGINT))
                 FROM sq_customer WHERE c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM sq_orders
                          WHERE o_custkey = c_custkey
                            AND o_orderdate >= TIMESTAMP '{INACTIVE_SINCE}')
        GROUP BY c_mktsegment
        """
    )


def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar aggregate subquery (TPC-H q17 shape): revenue
    from lines whose quantity is below 20 % of the per-part average, for
    one brand. Catalyst rewrites the correlated avg into a per-partkey
    aggregate joined back to the outer lineitem — the inner aggregation
    is partial-aggregated, shuffling only |distinct partkeys| rows.

    -> avg_yearly (one row)
    """
    _register(spark, sf_dir, "lineitem", "part")
    return spark.sql(
        f"""
        SELECT CAST(sum(CAST(CAST(l_extendedprice AS {DEC}) * 10000
                            AS BIGINT)) AS DOUBLE) / 10000.0 / 7.0
                   AS avg_yearly
        FROM sq_lineitem JOIN sq_part ON p_partkey = l_partkey
        WHERE p_brand = '{Q17_BRAND}'
          AND l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
                            FROM sq_lineitem l2
                            WHERE l2.l_partkey = p_partkey)
        """
    )


def large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING over a grouped subquery + multi-join (TPC-H q18 shape):
    orders whose total line quantity exceeds a threshold, with their
    customer. The HAVING filter runs on the aggregated (small) side
    before the joins, and the customer side broadcast-joins.

    -> c_name, o_orderkey, o_orderdate_ms, o_totalprice, sum_qty
    """
    li = ingest.load(spark, sf_dir, "lineitem")
    orders = ingest.load(spark, sf_dir, "orders")
    cust = ingest.load(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(
            F.sum((F.col("l_quantity").cast(DEC) * 10000).cast("long"))
            .alias("sq")
        )
        .filter(F.col("sq") > Q18_QTY * 10000)
        .select(
            "l_orderkey",
            (F.col("sq").cast("double") / F.lit(10000.0)).alias("sum_qty"),
        )
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "o_orderkey",
            F.unix_millis("o_orderdate").alias("o_orderdate_ms"),
            "o_totalprice",
            "sum_qty",
        )
    )


def promo_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE-weighted ratio aggregation (TPC-H q14 shape): percentage of
    one month's discounted revenue coming from promotional parts. One
    scan, one broadcast join (part is the small side), conditional
    aggregation — numerator and denominator in the same pass.

    -> promo_pct (one row)
    """
    li = ingest.load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= Q14_START) & (F.col("l_shipdate") < Q14_END)
    )
    part = ingest.load(spark, sf_dir, "part")
    rev_i4 = F.expr(
        "(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * 10000 AS BIGINT) * (10000 - CAST(CAST(l_discount AS DECIMAL(18,4)) * 10000 AS BIGINT)) + 5000) div 10000"
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.sum(
                F.when(F.col("p_type") == "PROMO", rev_i4).otherwise(
                    F.lit(0).cast("long")
                )
            ).alias("pr"),
            F.sum(rev_i4).alias("tr"),
        )
        .select(
            (
                F.lit(100.0)
                * F.col("pr").cast("double")
                / F.col("tr").cast("double")
            ).alias("promo_pct")
        )
    )


def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outer-join count distribution (TPC-H q13 shape): how many
    customers placed exactly N orders, including N=0 via the left outer
    join. Two-level aggregation: the first groupBy reduces to
    |customers| rows, the second to |distinct counts| — each strictly
    smaller than its input.

    -> c_count, custdist
    """
    cust = ingest.load(spark, sf_dir, "customer")
    orders = ingest.load(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


SUBQUERY_QUERIES = {
    "exists_high_qty_orders": exists_high_qty_orders,
    "not_exists_lapsed_customers": not_exists_lapsed_customers,
    "scalar_subquery_small_qty_revenue": small_quantity_revenue,
    "having_large_volume_customers": large_volume_customers,
    "promo_revenue_ratio": promo_revenue_ratio,
    "customer_order_distribution": customer_order_distribution,
}


def subquery_oracles() -> dict[str, str]:
    return {
        "exists_high_qty_orders": f"""
SELECT o_orderpriority, count(*) AS n_orders
FROM orders
WHERE o_orderdate >= TIMESTAMP '{EXISTS_START}'
  AND o_orderdate <  TIMESTAMP '{EXISTS_END}'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_quantity > {EXISTS_QTY})
GROUP BY o_orderpriority""",
        "not_exists_lapsed_customers": f"""
SELECT c_mktsegment, count(*) AS n_custs,
       CAST(CAST(sum(CAST(CAST(c_acctbal AS DECIMAL(18,4)) * 10000 AS BIGINT)) AS BIGINT) AS DOUBLE)
           / 10000.0 AS total_bal
FROM customer
WHERE CAST(CAST(c_acctbal AS DECIMAL(18,4)) * 10000 AS BIGINT)
      * (SELECT count(*) FROM customer WHERE c_acctbal > 0)
      > (SELECT CAST(sum(CAST(CAST(c_acctbal AS DECIMAL(18,4)) * 10000 AS BIGINT)) AS BIGINT)
         FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '{INACTIVE_SINCE}')
GROUP BY c_mktsegment""",
        "scalar_subquery_small_qty_revenue": f"""
SELECT CAST(CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * 10000 AS BIGINT)) AS BIGINT) AS DOUBLE)
           / 10000.0 / 7.0 AS avg_yearly
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = '{Q17_BRAND}'
  AND l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
                    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)""",
        "having_large_volume_customers": f"""
SELECT c_name, o_orderkey, epoch_ms(o_orderdate) AS o_orderdate_ms,
       o_totalprice, sum_qty
FROM (
    SELECT l_orderkey,
           CAST(CAST(sum(CAST(CAST(l_quantity AS DECIMAL(18,4)) * 10000 AS BIGINT)) AS BIGINT) AS DOUBLE)
               / 10000.0 AS sum_qty
    FROM lineitem GROUP BY l_orderkey
    HAVING sum(CAST(CAST(l_quantity AS DECIMAL(18,4)) * 10000 AS BIGINT)) > {Q18_QTY} * 10000
) big
JOIN orders ON o_orderkey = big.l_orderkey
JOIN customer ON c_custkey = o_custkey""",
        "promo_revenue_ratio": f"""
SELECT 100.0 * CAST(CAST(sum(CASE WHEN p_type = 'PROMO'
                     THEN (CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * 10000 AS BIGINT) * (10000 - CAST(CAST(l_discount AS DECIMAL(18,4)) * 10000 AS BIGINT)) + 5000) // 10000 ELSE 0 END) AS BIGINT) AS DOUBLE)
             / CAST(CAST(sum((CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * 10000 AS BIGINT) * (10000 - CAST(CAST(l_discount AS DECIMAL(18,4)) * 10000 AS BIGINT)) + 5000) // 10000) AS BIGINT) AS DOUBLE)
           AS promo_pct
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE l_shipdate >= TIMESTAMP '{Q14_START}'
  AND l_shipdate <  TIMESTAMP '{Q14_END}'""",
        "customer_order_distribution": """
SELECT c_count, count(*) AS custdist FROM (
    SELECT c_custkey, count(o_orderkey) AS c_count
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
) GROUP BY c_count""",
    }
