"""JDBC serving-store sink (A12/A13 production variant): DDL + upsert
SQL generation and a foreachBatch writer for a Postgres-compatible
store.

The reference creates its own tables at job start
(ChannelStatsAggregation.java:36-42 etc.) and writes every stats row as
two physical rows — the window delta and the ``timestamp=0`` running
total — through one batched ``INSERT ... ON CONFLICT DO UPDATE``
prepared statement (ChannelStatsAggregation.java:45-63). This module
generates byte-compatible DDL/DML for both merge disciplines:

- ``additive``: ``SET v = t.v + EXCLUDED.v`` — pair with per-batch
  delta emission (``streaming.pipeline.start_delta_pipeline``); needs
  batch-id idempotence on replay (the reference needs XA 2PC for the
  same reason).
- ``set``: ``SET v = EXCLUDED.v`` — pair with update-mode cumulative
  emission (``streaming.pipeline.start_pipeline``); naturally
  idempotent, no transaction coordination needed (design D3).

No JDBC driver ships in this container, so ``write_batch_jdbc`` is
gated on psycopg2/pg8000 availability; the SQL generation — the part
with reference parity to check — is pure and unit-tested.
"""

from __future__ import annotations

import functools
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame

# (table, [(col, sql_type)...], pk) — SURVEY.md §1.3, DDL parity with the
# reference's prepareTable implementations.
FACT_TABLES: dict[str, tuple[list[tuple[str, str]], list[str]]] = {
    "channel_stats": (
        [("channel", "VARCHAR(32)"), ("timestamp", "BIGINT"), ("messages", "BIGINT")],
        ["channel", "timestamp"],
    ),
    "user_stats": (
        [
            ("channel", "VARCHAR(32)"),
            ("username", "VARCHAR(32)"),
            ("timestamp", "BIGINT"),
            ("messages", "INT"),
        ],
        ["channel", "username", "timestamp"],
    ),
    "emote_stats": (
        [
            ("channel", "VARCHAR(32)"),
            ("emote", "VARCHAR(150)"),
            ("timestamp", "BIGINT"),
            ("occurrences", "BIGINT"),
        ],
        ["channel", "emote", "timestamp"],
    ),
    "user_emote_stats": (
        [
            ("channel", "VARCHAR(32)"),
            ("emote", "VARCHAR(150)"),
            ("username", "VARCHAR(32)"),
            ("timestamp", "BIGINT"),
            ("occurrences", "INT"),
        ],
        ["channel", "emote", "username", "timestamp"],
    ),
    "phrase_stats": (
        [
            ("channel", "VARCHAR(32)"),
            ("phrase_name", "VARCHAR(64)"),
            ("timestamp", "BIGINT"),
            ("matches", "BIGINT"),
        ],
        ["channel", "phrase_name", "timestamp"],
    ),
}


def create_table_sql(table: str) -> str:
    """``CREATE TABLE IF NOT EXISTS`` parity
    (ChannelStatsAggregation.java:36-42)."""
    cols, pk = FACT_TABLES[table]
    col_defs = ", ".join(f"{c} {t} NOT NULL" for c, t in cols)
    return (
        f"CREATE TABLE IF NOT EXISTS {table}({col_defs}, "
        f"PRIMARY KEY({', '.join(pk)}))"
    )


def upsert_sql(table: str, mode: str = "additive") -> str:
    """One-row upsert statement (the reference batches two value tuples
    per stats row — delta + total — through the same statement;
    ChannelStatsAggregation.java:45-50)."""
    cols, pk = FACT_TABLES[table]
    names = [c for c, _ in cols]
    value_col = names[-1]
    placeholders = ", ".join(["%s"] * len(names))
    if mode == "additive":
        action = f"{value_col} = {table}.{value_col} + EXCLUDED.{value_col}"
    elif mode == "set":
        action = f"{value_col} = EXCLUDED.{value_col}"
    else:
        raise ValueError(f"unknown merge mode: {mode}")
    return (
        f"INSERT INTO {table}({', '.join(names)}) VALUES ({placeholders}) "
        f"ON CONFLICT({', '.join(pk)}) DO UPDATE SET {action}"
    )


def _pg_connect(dsn: str):  # pragma: no cover - driver not in image
    import psycopg2

    return psycopg2.connect(dsn)


def _write_partition(
    rows, connection_factory: Callable, sql: str, names: list[str], batch_size: int
) -> None:
    """Executor-side partition writer: one connection per partition,
    executemany in ``batch_size`` chunks (reference batch size 100,
    AbstractStatsAggregation.java:154), one commit per partition —
    partition-atomic like the reference's per-flush transaction."""
    conn = connection_factory()
    try:
        cur = conn.cursor()
        buf: list[tuple] = []
        for r in rows:
            buf.append(tuple(r[n] for n in names))
            if len(buf) >= batch_size:
                cur.executemany(sql, buf)
                buf.clear()
        if buf:
            cur.executemany(sql, buf)
        conn.commit()
    finally:
        conn.close()


@dataclass
class JdbcSink:
    """foreachBatch callable writing a stats DataFrame through the
    upsert statement EXECUTOR-SIDE: ``foreachPartition`` opens one
    connection per partition and streams that partition's rows through
    executemany batches. The micro-batch is never materialized on the
    driver — at 100 TB the sink scales with executor count, the driver
    only coordinates.

    ``connection_factory`` is an injection seam (tests substitute a
    recording connection; production default is psycopg2 over ``dsn``).
    """

    dsn: str
    table: str
    mode: str = "additive"
    batch_size: int = 100
    connection_factory: Callable | None = None

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        factory = self.connection_factory
        if factory is None:
            try:
                import psycopg2  # noqa: F401
            except ImportError as e:  # pragma: no cover - driver not in image
                raise NotImplementedError(
                    "JDBC sink needs a Postgres driver (psycopg2); not bundled "
                    "in this environment — use the parquet merge sink instead"
                ) from e
            factory = functools.partial(_pg_connect, self.dsn)
        cols, _ = FACT_TABLES[self.table]
        names = [c for c, _ in cols]
        writer = functools.partial(
            _write_partition,
            connection_factory=factory,
            sql=upsert_sql(self.table, self.mode),
            names=names,
            batch_size=self.batch_size,
        )
        batch_df.select(*names).foreachPartition(writer)
