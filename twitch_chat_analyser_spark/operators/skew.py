"""Skew-mitigation utilities: salted two-phase aggregation and
replicated-salt joins (the task-prompt scale toolkit; complements AQE's
automatic skew-join splitting).

When to use which (100 TB guidance):

- **AQE skew join** (on by default in ``session.py``) splits oversized
  sort-merge partitions automatically — first line of defense, zero code.
- **Salted aggregation** (here): a groupBy whose hottest key exceeds one
  executor's memory/CPU (e.g. per-channel counts where one channel is
  50% of traffic). Phase 1 aggregates on (key, salt) spreading the hot
  key over N reducers; phase 2 merges the N partials. Works for any
  MERGEABLE aggregate (sum/count/min/max); exact, not approximate.
- **Replicated-salt join** (here): a fact⋈fact join on a skewed key
  where neither side broadcasts. The skewed side gets a random salt in
  [0, N); the other side is replicated N times with each salt value, so
  the hot key's rows split across N co-partitions. Costs N× the small
  side's shuffle — size N to the skew ratio, not larger.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MERGE_FNS = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
PHASE1_FNS = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: list[tuple[str, str, str]],
    num_salts: int = 16,
    salt_on: list[str] | None = None,
) -> DataFrame:
    """Two-phase aggregation over ``aggs = [(col, fn, alias)]`` with
    ``fn`` in {sum, count, min, max}. Result equals the plain
    ``groupBy(keys).agg(...)`` for these mergeable functions; the hot
    key's phase-1 work is spread across ``num_salts`` reducers.

    Salt choice (review r10): the default random-per-row salt spreads
    perfectly but is NON-DETERMINISTIC — if a shuffle map task is lost
    and recomputed after reducers already fetched part of its output
    (the SPARK-23207 class of failures), the recomputed rows salt
    differently and partials can double-count or drop. Pass
    ``salt_on`` (any high-cardinality row-identity columns, e.g. an
    event id) to derive the salt as ``pmod(hash(*salt_on), N)``
    instead: same spread for non-degenerate ids, and a recomputed task
    reproduces byte-identical output.
    """
    for _, fn, _ in aggs:
        if fn not in PHASE1_FNS:
            raise ValueError(f"non-mergeable aggregate: {fn}")
    salted = df.withColumn("_salt", salt_column(num_salts, salt_on))
    phase1 = salted.groupBy(*keys, "_salt").agg(
        *[
            PHASE1_FNS[fn](col).alias(alias)
            for col, fn, alias in aggs
        ]
    )
    return phase1.groupBy(*keys).agg(
        *[
            MERGE_FNS[fn](alias).cast("long").alias(alias)
            if fn == "count"
            else MERGE_FNS[fn](alias).alias(alias)
            for _, fn, alias in aggs
        ]
    )


def replicated_salt_join(
    skewed: DataFrame,
    other: DataFrame,
    on: list[str],
    num_salts: int = 16,
    how: str = "inner",
    salt_on: list[str] | None = None,
) -> DataFrame:
    """Join ``skewed`` (salted) with ``other`` (replicated once per
    salt value) on ``on`` + the salt. Equal to the plain join; the hot
    join key fans out over ``num_salts`` co-partitions. ``salt_on``:
    same retry-determinism trade-off as :func:`salted_aggregate`.
    """
    salts = (
        skewed.sparkSession.range(num_salts)
        .select(F.col("id").cast("int").alias("_salt"))
    )
    left = skewed.withColumn("_salt", salt_column(num_salts, salt_on))
    right = other.crossJoin(F.broadcast(salts))
    return left.join(right, [*on, "_salt"], how).drop("_salt")


def salt_column(num_salts: int, salt_on: list[str] | None = None) -> Column:
    """The salt expression for custom compositions: random by default,
    deterministic ``pmod(hash(*salt_on), N)`` when row-identity columns
    are given (recompute-safe under task retries — see
    :func:`salted_aggregate`)."""
    if salt_on:
        return F.pmod(F.hash(*salt_on), F.lit(num_salts)).cast("int")
    return (F.rand() * num_salts).cast("int")
