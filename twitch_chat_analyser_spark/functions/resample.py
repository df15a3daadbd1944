"""Time-series resampling with linear interpolation (SURVEY.md B15).

Re-implements the reference dashboard's ``resampleTimeSeries``
(MainController.php:588-680) as one declarative Spark plan instead of a
PHP loop:

- target grid: the PHP loop does ``t = ceil(t + step)`` with float
  ``step = (end-start)/(numPoints-1)``; since ``t`` stays integral,
  ``ceil(t + step) == t + ceil(step)`` — i.e. the grid is the arithmetic
  sequence ``range(start, end, ceil(step))`` plus a final clamped
  ``end`` point (MainController.php:674-676);
- clamping: grid points at/before the first sample take the first
  sample's value, at/after the last take the last's
  (MainController.php:632-641);
- otherwise linear interpolation between the bracketing samples,
  ``round()``ed half-away-from-zero (MainController.php:664-667);
- a sample exactly ON a grid point is its own "before" with k=0
  (MainController.php:648-661) — returned verbatim.

The bracketing samples are found with a single sort, not a join: grid
points and samples are unioned, ordered by (ts, is_grid) — a sample at
the same instant sorts before the grid point, matching the PHP tie rule
— and filled with last/first ``IGNORE NULLS`` window functions. The
window is unpartitioned by design: resampling runs per already-reduced
series (one channel's window buckets — thousands of rows), never on raw
events; for many-series batch resampling, partition the window by the
series key instead.

Count-dependent branches (MainController.php:598-624): empty series ->
two default points; ``numPoints >= n`` -> returned as-is (never
up-samples); zero-span window -> two points 60 s apart. With explicit
bounds these fold INTO the plan (three union branches gated by a
broadcast 1-row count) so a resample is a single Spark job; only the
bounds-free call — dynamic grid, error contract on empty input — pays
a driver action.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def resample_grid(start: int, end: int, num_points: int) -> list[int]:
    """The PHP loop's grid (integral, stride = ceil(step), end clamped).

    Degenerate spans follow the PHP ``while (t <= endTime)`` loop
    (review r10): a NEGATIVE span never enters the loop (empty grid,
    where ``range`` with a negative stride would descend), and a ZERO
    span runs exactly once then breaks (one point, where ``range``
    would raise on stride 0). ``resample_time_series`` pre-adjusts
    zero spans (MainController.php:621-624) so these only matter for
    direct callers."""
    if num_points < 2:
        num_points = 2
    if end < start:
        return []
    if end == start:
        return [start]
    stride = math.ceil((end - start) / (num_points - 1))
    return list(range(start, end, stride)) + [end]


def interpolate_on_grid(
    series: DataFrame, grid: list[int], value_col: str
) -> DataFrame:
    """Core interpolation: ``series(timestamp, value_col)`` -> one row per
    grid point. Pure plan — no driver-side branches."""
    spark = series.sparkSession
    grid_df = spark.createDataFrame(
        [(t,) for t in grid], T.StructType([T.StructField("timestamp", T.LongType())])
    )
    u = grid_df.select(
        "timestamp",
        F.lit(None).cast("double").alias("v"),
        F.lit(1).alias("is_grid"),
    ).unionAll(
        series.select(
            "timestamp", F.col(value_col).cast("double").alias("v"), F.lit(0)
        )
    )
    # single-ordered-pass windows: inherent to interpolating ONE series,
    # and bounded — |grid| <= 500 (dashboard resolution caps,
    # MainController.php:21) + |series| <= the queried window's buckets.
    # Resampling many series at once would partition these by the dims.
    w_before = Window.orderBy("timestamp", "is_grid").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_after = Window.orderBy("timestamp", "is_grid").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    sample_ts = F.when(F.col("is_grid") == 0, F.col("timestamp"))
    filled = u.select(
        "timestamp",
        "is_grid",
        F.max(sample_ts).over(w_before).alias("before_ts"),
        F.last("v", ignorenulls=True).over(w_before).alias("before_v"),
        F.min(sample_ts).over(w_after).alias("after_ts"),
        F.first("v", ignorenulls=True).over(w_after).alias("after_v"),
    )
    first_ts = F.min(F.when(F.col("is_grid") == 0, F.col("timestamp"))).over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    # first/last sample values via global window over the union
    bounds = filled.withColumn("first_ts", first_ts).withColumn(
        "last_ts",
        F.max(F.when(F.col("is_grid") == 0, F.col("timestamp"))).over(
            Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ),
    )
    k = (F.col("timestamp") - F.col("before_ts")) / (
        F.col("after_ts") - F.col("before_ts")
    )
    interp = F.round(F.col("before_v") + k * (F.col("after_v") - F.col("before_v")))
    # clamp branches: before the first sample, before_v is NULL and the
    # "after" fill IS the first sample (and vice versa past the last) —
    # coalesce covers both the strict and the ts==boundary cases
    value = (
        F.when(
            F.col("timestamp") <= F.col("first_ts"),
            F.coalesce("before_v", "after_v"),
        )
        .when(
            F.col("timestamp") >= F.col("last_ts"),
            F.coalesce("after_v", "before_v"),
        )
        .when(F.col("before_ts") == F.col("timestamp"), F.col("before_v"))
        .otherwise(interp)
    )
    return (
        bounds.filter(F.col("is_grid") == 1)
        .select("timestamp", value.cast("long").alias(value_col))
        .orderBy("timestamp")
    )


def interpolate_on_grid_multi(
    series: DataFrame, dims: list[str], grid: list[int], value_col: str
) -> DataFrame:
    """Many-series resampling in ONE plan: identical interpolation
    semantics to :func:`interpolate_on_grid`, with every window
    partitioned by the series key — the scale path the single-series
    form documents. One shuffle on the dims; per-series sorted frames;
    series count scales out, not up. Equality with the per-series
    operator is pinned by a pytest.

    ``series`` needs (*dims, timestamp, value_col); every series gets
    the full grid (the grid side is |grid| x |series| rows — grid is
    <= 500 points by the dashboard caps, so the union stays dominated
    by the data).

    -> *dims, timestamp, <value_col>
    """
    spark = series.sparkSession
    grid_df = spark.createDataFrame(
        [(t,) for t in grid],
        T.StructType([T.StructField("timestamp", T.LongType())]),
    )
    # the input feeds TWO branches (the key-set for the grid cross join
    # and the union's sample side); materialize it once — lazy
    # localCheckpoint stores it inside the consuming action, so the
    # upstream (often a full fact derivation) never evaluates twice
    series = series.localCheckpoint(eager=False)
    keys = series.select(*dims).distinct()
    u = keys.crossJoin(grid_df).select(
        *dims,
        "timestamp",
        F.lit(None).cast("double").alias("v"),
        F.lit(1).alias("is_grid"),
    ).unionAll(
        series.select(
            *dims,
            "timestamp",
            F.col(value_col).cast("double").alias("v"),
            F.lit(0),
        )
    )
    w_before = (
        Window.partitionBy(*dims)
        .orderBy("timestamp", "is_grid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_after = (
        Window.partitionBy(*dims)
        .orderBy("timestamp", "is_grid")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    w_all = Window.partitionBy(*dims).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    sample_ts = F.when(F.col("is_grid") == 0, F.col("timestamp"))
    bounds = u.select(
        *dims,
        "timestamp",
        "is_grid",
        F.max(sample_ts).over(w_before).alias("before_ts"),
        F.last("v", ignorenulls=True).over(w_before).alias("before_v"),
        F.min(sample_ts).over(w_after).alias("after_ts"),
        F.first("v", ignorenulls=True).over(w_after).alias("after_v"),
        F.min(sample_ts).over(w_all).alias("first_ts"),
        F.max(sample_ts).over(w_all).alias("last_ts"),
    )
    k = (F.col("timestamp") - F.col("before_ts")) / (
        F.col("after_ts") - F.col("before_ts")
    )
    interp = F.round(F.col("before_v") + k * (F.col("after_v") - F.col("before_v")))
    value = (
        F.when(
            F.col("timestamp") <= F.col("first_ts"),
            F.coalesce("before_v", "after_v"),
        )
        .when(
            F.col("timestamp") >= F.col("last_ts"),
            F.coalesce("after_v", "before_v"),
        )
        .when(F.col("before_ts") == F.col("timestamp"), F.col("before_v"))
        .otherwise(interp)
    )
    return (
        bounds.filter(F.col("is_grid") == 1)
        .select(*dims, "timestamp", value.cast("long").alias(value_col))
        .orderBy(*dims, "timestamp")
    )


def resample_time_series(
    series: DataFrame,
    value_col: str,
    num_points: int = 1000,
    start: int | None = None,
    end: int | None = None,
) -> DataFrame:
    """Full PHP-parity entry point including the count-dependent branches
    (MainController.php:598-624). ``series`` must have columns
    (timestamp BIGINT ms, value_col) and be unique per timestamp.

    With explicit bounds (every dashboard call — the window is a request
    parameter) this is ONE Spark job: the grid is static, and the
    count-dependent branches (empty -> two defaults; ``num_points >= n``
    -> passthrough; else interpolate) are folded into one plan as three
    union branches gated by a broadcast 1-row count — the same
    scalar-broadcast shape as the rolling-sums ``now`` anchor
    (plans/api.py b13). Without bounds the grid itself depends on the
    data extrema and the empty-series contract is an ERROR, so that path
    keeps one cheap driver action on the already-reduced series."""
    spark = series.sparkSession
    if num_points < 2:
        num_points = 2
    # series feeds the count gate, the passthrough branch AND the
    # interpolation union — materialize the (already-reduced) series
    # once so the branch gates can't re-run its derivation chain
    series = series.localCheckpoint(eager=False)
    schema = T.StructType(
        [
            T.StructField("timestamp", T.LongType()),
            T.StructField(value_col, T.LongType()),
        ]
    )
    if start is None or end is None:
        stats = series.agg(
            F.count("*").alias("n"),
            F.min("timestamp").alias("first_ts"),
            F.max("timestamp").alias("last_ts"),
        ).collect()[0]
        if stats["n"] == 0:
            raise ValueError("empty series and no start/end given")
        if num_points >= stats["n"]:  # never up-sample
            # same long cast as the static-bounds passthrough branch:
            # the contract is an integral series, and both entry paths
            # must return identical values for identical inputs
            return series.orderBy("timestamp").select(
                "timestamp", F.col(value_col).cast("long").alias(value_col)
            )
        start = start if start is not None else stats["first_ts"]
        end = end if end is not None else stats["last_ts"]
    # static bounds from here on: branch conditions use the ORIGINAL
    # num_points (PHP checks upsampling before the zero-span adjustment)
    g_start, g_end, g_np = start, end, num_points
    if end - start == 0:
        g_end = start + 60_000
        g_np = 2
    n_df = series.agg(F.count("*").alias("_n"))
    defaults = spark.createDataFrame([(start, 0), (end, 0)], schema)
    as_is = series.select(
        "timestamp", F.col(value_col).cast("long").alias(value_col)
    )
    interp = interpolate_on_grid(
        series, resample_grid(g_start, g_end, g_np), value_col
    )
    picked = (
        defaults.crossJoin(F.broadcast(n_df))
        .filter(F.col("_n") == 0)
        .unionByName(
            as_is.crossJoin(F.broadcast(n_df)).filter(
                (F.col("_n") > 0) & (F.col("_n") <= num_points)
            )
        )
        .unionByName(
            interp.crossJoin(F.broadcast(n_df)).filter(
                F.col("_n") > num_points
            )
        )
    )
    return picked.select("timestamp", value_col).orderBy("timestamp")
