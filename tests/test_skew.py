"""Salted two-phase aggregation and replicated-salt joins: results must
equal the unsalted plans on skewed data; the salted plan must actually
fan the hot key out (two aggregation levels in the plan)."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from twitch_chat_analyser_spark.operators import skew


@pytest.fixture(scope="module")
def skewed(spark):
    # one mega-hot key (90%) + long tail
    hot = spark.range(9000).select(
        F.lit("hot").alias("k"), (F.col("id") % 7).alias("v")
    )
    tail = spark.range(1000).select(
        F.concat(F.lit("t"), (F.col("id") % 50).cast("string")).alias("k"),
        (F.col("id") % 11).alias("v"),
    )
    return hot.unionAll(tail)


def test_salted_aggregate_matches_plain(spark, skewed):
    plain = (
        skewed.groupBy("k")
        .agg(
            F.sum("v").alias("s"),
            F.count("*").alias("n"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
        )
    )
    salted = skew.salted_aggregate(
        skewed,
        ["k"],
        [("v", "sum", "s"), ("v", "count", "n"), ("v", "min", "lo"), ("v", "max", "hi")],
        num_salts=8,
    )
    assert sorted(map(tuple, salted.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_salted_aggregate_rejects_non_mergeable(skewed):
    with pytest.raises(ValueError):
        skew.salted_aggregate(skewed, ["k"], [("v", "avg", "a")])


def test_salted_plan_has_two_aggregation_phases(skewed):
    df = skew.salted_aggregate(skewed, ["k"], [("v", "sum", "s")], num_salts=8)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    # partial+final for phase 1 on (k, _salt) and partial+final for the
    # phase-2 merge on k
    assert plan.count("HashAggregate") >= 4


def test_replicated_salt_join_matches_plain(spark, skewed):
    dim = spark.createDataFrame(
        [("hot", 1.5)] + [(f"t{i}", float(i)) for i in range(50)], "k string, w double"
    )
    plain = skewed.join(dim, "k").select("k", "v", "w")
    salted = skew.replicated_salt_join(skewed, dim, ["k"], num_salts=4).select(
        "k", "v", "w"
    )
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_replicated_salt_left_join_keeps_unmatched(spark, skewed):
    dim = spark.createDataFrame([("hot", 1.0)], "k string, w double")
    out = skew.replicated_salt_join(skewed, dim, ["k"], num_salts=4, how="left")
    assert out.count() == skewed.count()
    assert out.filter(F.col("w").isNull()).count() == 1000  # the tail


def test_deterministic_salt_matches_plain_and_spreads(spark, skewed):
    """Review r10: rand() salts are nondeterministic under stage
    retries (a recomputed map task re-salts differently); salt_on
    derives the salt from row identity, reproducing byte-identical
    output on recompute while matching the plain aggregation."""
    plain = skewed.groupBy("k").agg(
        F.sum("v").alias("s"), F.count("*").alias("n")
    )
    salted = skew.salted_aggregate(
        skewed,
        ["k"],
        [("v", "sum", "s"), ("v", "count", "n")],
        num_salts=8,
        salt_on=["k", "v"],
    )
    assert sorted(map(tuple, salted.collect())) == sorted(
        map(tuple, plain.collect())
    )
    # the salt expression is a pure row function in [0, N) (pmod folds
    # hash()'s negatives) and identical across evaluations
    salts = skewed.select(
        skew.salt_column(8, ["k", "v"]).alias("s1"),
        skew.salt_column(8, ["k", "v"]).alias("s2"),
    )
    rows = salts.collect()
    assert all(0 <= r["s1"] < 8 and r["s1"] == r["s2"] for r in rows)


def test_deterministic_salt_join_matches_plain(spark, skewed):
    dim = spark.createDataFrame(
        [("hot", 1.5)] + [(f"t{i}", float(i)) for i in range(50)],
        "k string, w double",
    )
    plain = skewed.join(dim, "k").select("k", "v", "w")
    salted = skew.replicated_salt_join(
        skewed, dim, ["k"], num_salts=4, salt_on=["k", "v"]
    ).select("k", "v", "w")
    assert sorted(map(tuple, salted.collect())) == sorted(
        map(tuple, plain.collect())
    )
