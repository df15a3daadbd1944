"""Table profiling: per-column data-quality statistics in ONE scan —
the validation pass a training-data pipeline runs before/after every
transformation (null rates, cardinalities, ranges, text lengths).

Scale design: all per-column aggregates are expressions inside a single
``agg(...)`` — one scan, one partial/final aggregation, no shuffle of
raw rows, regardless of how many columns are profiled (the alternative,
one pass per column, scans the table C times). Exact ``count(DISTINCT)``
over many columns would multiply the aggregation buffers (Spark plans
multi-distinct via Expand, one duplicate of each row per distinct
column), so cardinality uses ``approx_count_distinct`` by default with
an exact opt-in — at 100 TB the sketch is the only sane default; the
registry query pins the exact variant on low-cardinality columns so the
oracle can verify it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import ingest


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    exact_distinct: bool = False,
) -> DataFrame:
    """Long-format profile: one row per column with rows/nulls/distinct
    and (for numerics) min/max, (for strings) min/max length.

    -> column, n_rows, n_null, n_distinct, min_num, max_num, min_len, max_len
    """
    columns = columns or df.columns
    total = F.count(F.lit(1))
    aggs = [total.alias("_n")]
    for c in columns:
        dtype = dict(df.dtypes)[c]
        is_num = dtype in (
            "tinyint", "smallint", "int", "bigint", "float", "double"
        ) or dtype.startswith("decimal")
        aggs.append(F.count(F.when(F.col(c).isNull(), 1)).alias(f"{c}__null"))
        aggs.append(
            (
                F.countDistinct(c)
                if exact_distinct
                else F.approx_count_distinct(c)
            ).alias(f"{c}__dist")
        )
        aggs.append(
            (F.min(c).cast("double") if is_num else F.lit(None).cast("double"))
            .alias(f"{c}__min")
        )
        aggs.append(
            (F.max(c).cast("double") if is_num else F.lit(None).cast("double"))
            .alias(f"{c}__max")
        )
        if dtype == "string":
            aggs.append(F.min(F.length(c)).alias(f"{c}__minlen"))
            aggs.append(F.max(F.length(c)).alias(f"{c}__maxlen"))
        else:
            aggs.append(F.lit(None).cast("int").alias(f"{c}__minlen"))
            aggs.append(F.lit(None).cast("int").alias(f"{c}__maxlen"))
    wide = df.agg(*aggs)
    # unpivot the single wide row into one row per column — a driver-free
    # stack() over a 1-row frame (cost-free at any scale)
    struct_rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("_n").alias("n_rows"),
                F.col(f"{c}__null").alias("n_null"),
                F.col(f"{c}__dist").alias("n_distinct"),
                F.col(f"{c}__min").alias("min_num"),
                F.col(f"{c}__max").alias("max_num"),
                F.col(f"{c}__minlen").alias("min_len"),
                F.col(f"{c}__maxlen").alias("max_len"),
            )
            for c in columns
        ]
    )
    return wide.select(F.explode(struct_rows).alias("p")).select("p.*")


def _q_profile_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return profile_table(
        ingest.load(spark, sf_dir, "documents"),
        columns=["doc_id", "lang", "source", "text"],
        exact_distinct=True,
    ).orderBy("column")


PROFILING_QUERIES = {"profile_documents": _q_profile_documents}


def profiling_oracles() -> dict[str, str]:
    cols = [
        ("doc_id", True, False),
        ("lang", False, True),
        ("source", False, True),
        ("text", False, True),
    ]
    parts = []
    for c, is_num, is_str in cols:
        min_num = f"CAST(min({c}) AS DOUBLE)" if is_num else "CAST(NULL AS DOUBLE)"
        max_num = f"CAST(max({c}) AS DOUBLE)" if is_num else "CAST(NULL AS DOUBLE)"
        min_len = f"CAST(min(len({c})) AS INT)" if is_str else "CAST(NULL AS INT)"
        max_len = f"CAST(max(len({c})) AS INT)" if is_str else "CAST(NULL AS INT)"
        parts.append(
            f"""
SELECT '{c}' AS column, count(*) AS n_rows,
       count(*) - count({c}) AS n_null,
       count(DISTINCT {c}) AS n_distinct,
       {min_num} AS min_num, {max_num} AS max_num,
       {min_len} AS min_len, {max_len} AS max_len
FROM documents"""
        )
    return {"profile_documents": "\nUNION ALL".join(parts)}
