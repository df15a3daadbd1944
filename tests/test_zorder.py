"""Z-order clustering: bit-interleave correctness (property vs the
Python reference), plan shape (pure codegen projection, no UDF), and
the layout property that justifies the operator — z-ordered files carry
tight min/max boxes on BOTH dimensions, so 2-D range scans can skip."""

from __future__ import annotations

import glob
import os

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from twitch_chat_analyser_spark.operators import zorder


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=65535),
            st.integers(min_value=0, max_value=65535),
        ),
        min_size=1,
        max_size=50,
    )
)
@settings(max_examples=10, deadline=None)
def test_zvalue_matches_python_reference(pairs):
    import duckdb

    # the rendered DuckDB SQL is the same arithmetic the Spark plan runs
    # (zvalue_sql differs only in shift syntax) — validate it against the
    # bit-twiddling reference implementation
    rows = duckdb.execute(
        "SELECT " + zorder.zvalue_sql("x", "y", "duckdb")
        + " FROM (SELECT unnest($1) AS x, unnest($2) AS y)",
        [[p[0] for p in pairs], [p[1] for p in pairs]],
    ).fetchall()
    assert [r[0] for r in rows] == [zorder.zvalue_py(x, y) for x, y in pairs]


def test_zvalue_spark_equals_python(spark):
    df = spark.range(0, 512).select(
        F.col("id"),
        ((F.col("id") * 2654435761) % 65536).alias("x"),
        ((F.col("id") * 40503) % 65536).alias("y"),
    )
    out = zorder.with_zvalue(df, "x", "y").orderBy("id").collect()
    for r in out:
        assert r.zvalue == zorder.zvalue_py(r.x, r.y), (r.x, r.y)


def test_zvalue_is_monotone_in_each_dim_prefix(spark):
    # interleave preserves per-dimension order within a fixed other dim:
    # z(x1,y) < z(x2,y) iff x1 < x2 (and same for y) — the property that
    # makes curve segments spatially local
    for x1, x2, y in [(0, 1, 7), (100, 200, 0), (65534, 65535, 12345)]:
        assert zorder.zvalue_py(x1, y) < zorder.zvalue_py(x2, y)
        assert zorder.zvalue_py(y, x1) < zorder.zvalue_py(y, x2)


def test_zvalue_plan_is_jvm_projection(spark, sf_dir):
    import contextlib
    import io

    df = zorder.with_zvalue(
        zorder.zorder_orders(spark, sf_dir).select(
            F.col("o_orderkey").alias("x"), F.col("zvalue").alias("y")
        ),
        "x",
        "y",
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    # bit arithmetic is a plain JVM projection — no Python eval node
    # (AQE's pre-execution formatted plan omits codegen spans, so the
    # absence of Python/ExistingRDD is the checkable invariant)
    assert "Python" not in plan
    assert "ExistingRDD" not in plan
    assert "Project" in plan


def test_zordered_layout_has_tight_2d_boxes(spark, sf_dir, tmp_path):
    """Files written along the z-curve must have much smaller (x, y)
    bounding boxes than row-order files — the measurable skipping win."""
    orders = (
        spark.read.format("parquet")
        .load(os.path.join(sf_dir, "orders.parquet"))
        .select(
            (F.col("o_custkey") % 256).alias("x"),
            (F.col("o_orderkey") % 256).alias("y"),
        )
    )

    def total_box_area(path: str) -> int:
        area = 0
        for f in glob.glob(os.path.join(path, "*.parquet")):
            st_ = (
                spark.read.parquet(f)
                .agg(
                    F.min("x"), F.max("x"), F.min("y"), F.max("y")
                )
                .first()
            )
            area += (st_[1] - st_[0] + 1) * (st_[3] - st_[2] + 1)
        return area

    naive = str(tmp_path / "naive")
    zord = str(tmp_path / "zord")
    orders.repartition(8).write.parquet(naive)
    zorder.write_zordered(orders, zord, "x", "y", num_files=8)
    naive_area, z_area = total_box_area(naive), total_box_area(zord)
    # 8 naive files each span ~the whole 256x256 plane; 8 z-curve
    # segments tile it, so summed box area must shrink dramatically
    assert z_area < naive_area / 2, (z_area, naive_area)


def test_zordered_roundtrip_preserves_rows(spark, sf_dir, tmp_path):
    orders = spark.read.format("parquet").load(
        os.path.join(sf_dir, "orders.parquet")
    ).select("o_orderkey", "o_custkey", (F.col("o_orderkey") % 512).alias("d"))
    path = str(tmp_path / "z")
    zorder.write_zordered(orders, path, "o_custkey", "d", num_files=4)
    back = spark.read.parquet(path)
    assert back.count() == orders.count()
    assert set(back.columns) == set(orders.columns)  # zvalue dropped
