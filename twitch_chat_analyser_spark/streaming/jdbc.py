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
  replay idempotence (the reference needs XA 2PC for the same reason),
  provided by a (table, batch, partition) ledger row claimed in the
  same transaction as the partition's upserts (``ledger_table_sql``).
- ``set``: ``SET v = EXCLUDED.v`` — pair with update-mode cumulative
  emission (``streaming.pipeline.start_pipeline``); naturally
  idempotent, no transaction coordination needed (design D3).

No Postgres driver ships in this container, so the psycopg2 default is
import-gated; the SQL generation is pure and unit-tested, and the full
executor-side writer (DDL, upserts, ledger claim, transaction
boundaries, retry/replay skip) additionally executes for real against
in-process SQLite — which shares Postgres's ``ON CONFLICT`` dialect —
both via ``paramstyle="qmark"`` and through the EXACT pyformat SQL
psycopg2 would receive (``PyformatOverQmarkConnection`` adapts the
placeholders at execute time; tests/test_jdbc_sqlite.py).
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


# DB-API paramstyle -> positional placeholder token. The generated SQL
# never interpolates values (placeholders only), so the statements are
# engine-portable modulo this token: psycopg2 is pyformat, stdlib
# sqlite3 is qmark — the latter drives the real-engine parity test
# (tests/test_jdbc_sqlite.py) since no Postgres driver ships here.
PARAM_PLACEHOLDERS = {"pyformat": "%s", "qmark": "?"}


def upsert_sql(table: str, mode: str = "additive", paramstyle: str = "pyformat") -> str:
    """One-row upsert statement (the reference batches two value tuples
    per stats row — delta + total — through the same statement;
    ChannelStatsAggregation.java:45-50)."""
    cols, pk = FACT_TABLES[table]
    names = [c for c, _ in cols]
    value_col = names[-1]
    placeholders = ", ".join([PARAM_PLACEHOLDERS[paramstyle]] * len(names))
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


LEDGER_TABLE = "_stream_applied_partitions"


def ledger_table_sql() -> str:
    """DDL for the replay ledger — run at job setup alongside the fact
    DDL (:func:`create_table_sql`). One row per successfully committed
    (table, batch, partition)."""
    return (
        f"CREATE TABLE IF NOT EXISTS {LEDGER_TABLE}("
        "table_name VARCHAR(64) NOT NULL, batch_id BIGINT NOT NULL, "
        "partition_id INT NOT NULL, "
        "PRIMARY KEY(table_name, batch_id, partition_id))"
    )


def ledger_claim_sql(paramstyle: str = "pyformat") -> str:
    """Claim statement: inserts the (table, batch, partition) marker, or
    affects 0 rows if a prior attempt already committed it."""
    ph = PARAM_PLACEHOLDERS[paramstyle]
    return (
        f"INSERT INTO {LEDGER_TABLE}(table_name, batch_id, partition_id) "
        f"VALUES ({ph}, {ph}, {ph}) ON CONFLICT DO NOTHING"
    )


def _pg_connect(dsn: str):  # pragma: no cover - driver not in image
    import psycopg2

    return psycopg2.connect(dsn)


class _PyformatOverQmarkCursor:
    """DB-API cursor translating pyformat positional placeholders
    (``%s``) to qmark (``?``) at execute time. Exact for this module's
    generated SQL, which interpolates no literals — placeholders are the
    only ``%s`` tokens that can appear."""

    def __init__(self, cur):
        self._cur = cur

    @property
    def rowcount(self):
        return self._cur.rowcount

    def execute(self, sql, params=()):
        return self._cur.execute(sql.replace("%s", "?"), params)

    def executemany(self, sql, seq):
        return self._cur.executemany(sql.replace("%s", "?"), seq)


class PyformatOverQmarkConnection:
    """Paramstyle-adapting DB-API connection: accepts the pyformat SQL
    psycopg2 would receive and executes it on a qmark engine (e.g.
    stdlib sqlite3) — the writer-facing psycopg2 surface (cursor /
    commit / rollback / close) over ``factory()``'s connection. Lets the
    Postgres-dialect statements drive a local engine end-to-end in
    development and tests; module-level (not a closure) so Spark workers
    unpickle it by reference."""

    def __init__(self, factory: Callable):
        self._conn = factory()

    def cursor(self):
        return _PyformatOverQmarkCursor(self._conn.cursor())

    def commit(self):
        self._conn.commit()

    def rollback(self):
        self._conn.rollback()

    def close(self):
        self._conn.close()


def _write_partition(
    rows,
    connection_factory: Callable,
    sql: str,
    names: list[str],
    batch_size: int,
    ledger_key: tuple[str, int] | None = None,
    paramstyle: str = "pyformat",
    rows_acc=None,
    txn_acc=None,
    skip_acc=None,
) -> None:
    """Executor-side partition writer: one connection per partition,
    executemany in ``batch_size`` chunks (reference batch size 100,
    AbstractStatsAggregation.java:154), one commit per partition —
    partition-atomic like the reference's per-flush transaction.

    With ``ledger_key`` (table, batch_id) the partition's ledger marker
    is claimed INSIDE the same transaction as its upserts: a Spark task
    retry after a successful commit — or a whole foreachBatch replay —
    finds the marker already present (claim affects 0 rows) and skips,
    so the non-idempotent additive upsert is applied exactly once per
    (batch, partition). This is the partition-granular version of the
    atomicity the reference buys with XA 2PC (XAPostgresSink.java:
    122-175); the SET-merge discipline doesn't need it (replays are
    naturally idempotent).

    VALID ONLY IF row->partition assignment is reproducible across
    replays — which the caller guarantees by hash-repartitioning the
    batch on the table's key with a PINNED partition count (JdbcSink
    does this; session shuffle settings and AQE coalescing must never
    decide these partition ids)."""
    conn = connection_factory()
    try:
        cur = conn.cursor()
        if ledger_key is not None:
            from pyspark import TaskContext

            ctx = TaskContext.get()
            pid = ctx.partitionId() if ctx is not None else 0
            cur.execute(
                ledger_claim_sql(paramstyle), (ledger_key[0], ledger_key[1], pid)
            )
            if getattr(cur, "rowcount", 1) == 0:
                conn.rollback()  # a completed prior attempt owns this partition
                if skip_acc is not None:
                    skip_acc.add(1)
                return
        buf: list[tuple] = []
        written = 0
        for r in rows:
            buf.append(tuple(r[n] for n in names))
            if len(buf) >= batch_size:
                cur.executemany(sql, buf)
                written += len(buf)
                buf.clear()
        if buf:
            cur.executemany(sql, buf)
            written += len(buf)
        conn.commit()
        # observability accumulators (bench/diagnostics): rows upserted
        # and transactions committed per partition. Task retries can
        # over-count accumulator updates — metrics only, never control.
        if rows_acc is not None:
            rows_acc.add(written)
        if txn_acc is not None:
            txn_acc.add(1)
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

    ``num_partitions`` pins the additive mode's write parallelism: the
    batch is hash-repartitioned on the table's primary key with this
    EXPLICIT count, so a replayed batch reproduces the identical
    row->partition assignment regardless of session shuffle settings or
    AQE — the invariant the per-partition replay ledger depends on.
    """

    dsn: str
    table: str
    mode: str = "additive"
    batch_size: int = 100
    connection_factory: Callable | None = None
    num_partitions: int = 32
    paramstyle: str = "pyformat"  # psycopg2; "qmark" for sqlite3
    # optional Spark accumulators (rows upserted / txns committed /
    # replay-skipped partitions) — metrics only, retry-over-countable
    rows_acc: object = None
    txn_acc: object = None
    skip_acc: object = None

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
        cols, pk = FACT_TABLES[self.table]
        names = [c for c, _ in cols]
        out = batch_df.select(*names)
        ledger_key = None
        if self.mode == "additive":
            # additive upserts are not idempotent -> ledger-guard each
            # partition, and make partition ids replay-stable by hash
            # partitioning on the key with a pinned count (see
            # _write_partition); SET-merge replays are no-ops as-is
            ledger_key = (self.table, batch_id)
            out = out.repartition(self.num_partitions, *pk)
        writer = functools.partial(
            _write_partition,
            connection_factory=factory,
            sql=upsert_sql(self.table, self.mode, self.paramstyle),
            names=names,
            batch_size=self.batch_size,
            ledger_key=ledger_key,
            paramstyle=self.paramstyle,
            rows_acc=self.rows_acc,
            txn_acc=self.txn_acc,
            skip_acc=self.skip_acc,
        )
        out.foreachPartition(writer)
