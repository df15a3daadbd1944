"""Output-type parity gate (tools/check_correctness.py --types).

The driver's value hash is Arrow-type-aware: a DuckDB HUGEINT (what
``sum(BIGINT)`` returns when left uncast) hashes differently from
Spark's BIGINT even when every value is equal. This class was invisible
to the raw-equality mirror for three rounds (``markov_transitions_ppm``,
VERDICT r7 "What's wrong" #1). These tests pin:

1. the DuckDB→Spark type-name mapping,
2. that the gate flags the EXACT old markov oracle shape (uncast
   window-sum) red and the fixed shape green,
3. that every oracle in the live registry carries no type mismatch
   (covered by the --types sweep in CI usage; here we spot-pin the two
   repaired oracles so a regression re-reds deterministically).
"""

from __future__ import annotations

import duckdb
import pytest

from tools.check_correctness import duck_type_to_spark, type_mismatches


@pytest.mark.parametrize(
    ("duck", "spark"),
    [
        ("BIGINT", "bigint"),
        ("INTEGER", "int"),
        ("HUGEINT", "hugeint"),  # deliberately never a Spark type
        ("DOUBLE", "double"),
        ("VARCHAR", "string"),
        ("TIMESTAMP", "timestamp"),
        ("DATE", "date"),
        ("BLOB", "binary"),
        ("DECIMAL(18,4)", "decimal(18,4)"),
        ("DECIMAL(38, 4)", "decimal(38,4)"),
        ("BIGINT[]", "array<bigint>"),
        ("VARCHAR[]", "array<string>"),
        ("DOUBLE[][]", "array<array<double>>"),
    ],
)
def test_duck_type_mapping(duck: str, spark: str) -> None:
    assert duck_type_to_spark(duck) == spark


def test_uncast_sum_is_flagged_cast_sum_is_not() -> None:
    """DuckDB widens sum(BIGINT) to HUGEINT; the gate must see it."""
    con = duckdb.connect()
    old = con.sql(
        "SELECT sum(x) OVER () AS src_total FROM (VALUES (1::BIGINT)) t(x)"
    )
    assert type_mismatches(
        ["src_total"], ["bigint"], old.columns, [str(t) for t in old.types]
    ) == ["src_total: spark=bigint duck=hugeint"]
    new = con.sql(
        "SELECT CAST(sum(x) OVER () AS BIGINT) AS src_total"
        " FROM (VALUES (1::BIGINT)) t(x)"
    )
    assert not type_mismatches(
        ["src_total"], ["bigint"], new.columns, [str(t) for t in new.types]
    )


def test_decimal_width_mismatch_is_flagged() -> None:
    """Spark sum(DECIMAL(18,4)) is DECIMAL(28,4); DuckDB's is
    DECIMAL(38,4) — value-equal, type-different, must flag."""
    con = duckdb.connect()
    rel = con.sql(
        "SELECT sum(CAST(x AS DECIMAL(18,4))) AS sq"
        " FROM (VALUES (1)) t(x)"
    )
    diffs = type_mismatches(
        ["sq"], ["decimal(28,4)"], rel.columns, [str(t) for t in rel.types]
    )
    assert diffs == ["sq: spark=decimal(28,4) duck=decimal(38,4)"]


def test_only_shared_column_names_compared() -> None:
    assert not type_mismatches(["a"], ["bigint"], ["b"], ["HUGEINT"])


@pytest.mark.parametrize(
    "name", ["markov_transitions_ppm", "sample_dsir_importance"]
)
def test_repaired_oracles_emit_spark_compatible_types(name: str) -> None:
    """The two registry oracles repaired in round 8 stay HUGEINT-free."""
    import __spark_entry__ as entrymod

    sql = entrymod.oracle_sql()[name]
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM"
            f" '/root/testdata/sf0.001/{t}.parquet'"
        )
    types = [duck_type_to_spark(str(t)) for t in con.sql(sql).types]
    assert "hugeint" not in types, types
