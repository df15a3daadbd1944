"""Z-order (Morton space-filling curve) clustering for multi-dimensional
data skipping — a scale capability the reference lacks (its serving index
is a 1-D Postgres PK, e.g. UserEmoteStatsAggregation.java:44; queries that
filter on a second dimension scan every row of the first).

Sorting a table by the bit-interleaved z-value of two key columns makes
parquet row-group min/max stats tight on BOTH columns at once, so a
2-D range predicate prunes row groups on either (or both) dimensions.
At 100 TB this is the difference between "partition by col A, full scan
within for col B" and skipping ~sqrt-proportionally on both.

The z-value is pure JVM-side bit arithmetic (shift/or/and — inside
whole-stage codegen, no UDF), and the identical arithmetic is rendered
for DuckDB so the oracle verifies it bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import ingest

# classic 16->32 bit spread: x = (x | x<<8) & 0x00FF00FF; ... & 0x0F0F0F0F;
# ... & 0x33333333; ... & 0x55555555 (decimal literals below — both SQL
# dialects parse them identically)
_SPREAD_STEPS = [(8, 16711935), (4, 252645135), (2, 858993459), (1, 1431655765)]
_MASK16 = 65535


def _spread_sql(expr: str, shift) -> str:
    """Render the bit-spread of the low 16 bits of ``expr`` (each input
    bit moved to an even position) as a SQL string; ``shift(e, n)``
    renders a left shift in the target dialect."""
    cur = f"(CAST({expr} AS BIGINT) & {_MASK16})"
    for n, mask in _SPREAD_STEPS:
        cur = f"(({cur} | {shift(cur, n)}) & {mask})"
    return cur


def _spark_shift(e: str, n: int) -> str:
    return f"shiftleft({e}, {n})"


def _duck_shift(e: str, n: int) -> str:
    return f"({e} << {n})"


def zvalue_sql(x: str, y: str, dialect: str = "spark") -> str:
    """Morton interleave of two 16-bit values: x in even bit positions,
    y in odd — one SQL expression string, same arithmetic both engines."""
    shift = _spark_shift if dialect == "spark" else _duck_shift
    return f"({_spread_sql(x, shift)} | {shift(_spread_sql(y, shift), 1)})"


def zvalue_py(x: int, y: int) -> int:
    """Python reference for property tests — mirrors the SQL steps."""

    def spread(v: int) -> int:
        v &= _MASK16
        for n, mask in _SPREAD_STEPS:
            v = (v | (v << n)) & mask
        return v

    return spread(x) | (spread(y) << 1)


def with_zvalue(df: DataFrame, x: str, y: str, out: str = "zvalue") -> DataFrame:
    return df.withColumn(out, F.expr(zvalue_sql(x, y, "spark")))


def write_zordered(
    df: DataFrame,
    path: str,
    x: str,
    y: str,
    num_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet clustered along the z-curve of (x, y):
    range-partition by z-value (contiguous curve segments per file, so
    file/row-group min-max boxes tile the plane instead of each spanning
    it) and sort within partitions (tight boxes per row group). The
    z-value itself is dropped — it is a layout device, not data."""
    (
        with_zvalue(df, x, y)
        .repartitionByRange(num_files, "zvalue")
        .sortWithinPartitions("zvalue")
        .drop("zvalue")
        .write.mode(mode)
        .parquet(path)
    )


# --- registry query: z-values of the orders table on (custkey, orderday) ---

Z_EPOCH = "1995-01-01"


def zorder_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-value assignment for orders on (o_custkey, days-since-epoch) —
    the clustering key :func:`write_zordered` lays the table out by.
    Pure projection (no shuffle); the oracle recomputes the identical
    bit arithmetic in DuckDB.

    -> o_orderkey, zvalue
    """
    orders = ingest.load(spark, sf_dir, "orders")
    x = f"(o_custkey & {_MASK16})"
    y = f"(datediff(o_orderdate, DATE '{Z_EPOCH}') & {_MASK16})"
    return orders.select(
        "o_orderkey", F.expr(zvalue_sql(x, y, "spark")).alias("zvalue")
    ).orderBy("o_orderkey")


ZORDER_QUERIES = {"zorder_orders": zorder_orders}


def zorder_oracles() -> dict[str, str]:
    x = f"(o_custkey & {_MASK16})"
    y = f"(date_diff('day', DATE '{Z_EPOCH}', o_orderdate) & {_MASK16})"
    return {
        "zorder_orders": f"""
SELECT o_orderkey, {zvalue_sql(x, y, 'duckdb')} AS zvalue
FROM orders"""
    }
