"""A12 JDBC sink SQL generation: DDL and upsert parity with the
reference's prepareTable/getUpsertSql statements."""

from __future__ import annotations

import pytest

from twitch_chat_analyser_spark.streaming import jdbc


def test_create_table_matches_reference_ddl():
    # ChannelStatsAggregation.java:36-42
    assert jdbc.create_table_sql("channel_stats") == (
        "CREATE TABLE IF NOT EXISTS channel_stats("
        "channel VARCHAR(32) NOT NULL, timestamp BIGINT NOT NULL, "
        "messages BIGINT NOT NULL, PRIMARY KEY(channel, timestamp))"
    )


def test_all_five_tables_have_ddl_and_upserts():
    for table in jdbc.FACT_TABLES:
        ddl = jdbc.create_table_sql(table)
        assert ddl.startswith("CREATE TABLE IF NOT EXISTS")
        assert "PRIMARY KEY" in ddl
        up = jdbc.upsert_sql(table)
        assert "ON CONFLICT" in up and "EXCLUDED." in up


def test_additive_upsert_matches_reference_semantics():
    # ChannelStatsAggregation.java:45-50: cnt = table.cnt + EXCLUDED.cnt
    sql = jdbc.upsert_sql("channel_stats", mode="additive")
    assert sql == (
        "INSERT INTO channel_stats(channel, timestamp, messages) "
        "VALUES (%s, %s, %s) ON CONFLICT(channel, timestamp) "
        "DO UPDATE SET messages = channel_stats.messages + EXCLUDED.messages"
    )


def test_set_mode_for_update_mode_cumulative_emission():
    sql = jdbc.upsert_sql("user_emote_stats", mode="set")
    assert sql.endswith("DO UPDATE SET occurrences = EXCLUDED.occurrences")
    assert "ON CONFLICT(channel, emote, username, timestamp)" in sql


def test_unknown_mode_rejected():
    with pytest.raises(ValueError):
        jdbc.upsert_sql("channel_stats", mode="replace")


def test_sink_without_driver_raises_not_implemented(spark):
    sink = jdbc.JdbcSink(dsn="postgresql://x", table="channel_stats")
    df = spark.createDataFrame(
        [("c", 0, 1)], "channel string, timestamp long, messages long"
    )
    try:
        import psycopg2  # noqa: F401

        pytest.skip("driver present; sink would attempt a connection")
    except ImportError:
        with pytest.raises(NotImplementedError):
            sink(df, 0)


def test_sink_writes_executor_side_per_partition(spark, tmp_path):
    """The sink must stream partitions through per-executor connections
    — never collect() the micro-batch to the driver. The recording
    connection factory writes one file per opened connection from
    inside the Python workers; with a multi-partition input we expect
    one connection per non-empty partition, each carrying only its
    partition's rows, all through the reference upsert statement."""
    out_dir = str(tmp_path / "writes")
    import os

    os.makedirs(out_dir, exist_ok=True)

    class RecordingCursor:
        def __init__(self, sink_dir):
            self.sink_dir = sink_dir
            self.stmts = []

        def executemany(self, sql, rows):
            self.stmts.append((sql, list(rows)))

    class RecordingConnection:
        def __init__(self, sink_dir):
            self.sink_dir = sink_dir
            self._cur = RecordingCursor(sink_dir)

        def cursor(self):
            return self._cur

        def commit(self):
            import json
            import uuid

            path = os.path.join(self.sink_dir, f"conn-{uuid.uuid4().hex}.json")
            with open(path, "w") as fh:
                json.dump(
                    [
                        {"sql": sql, "rows": [list(r) for r in rows]}
                        for sql, rows in self._cur.stmts
                    ],
                    fh,
                )

        def close(self):
            pass

    def factory(sink_dir=out_dir):
        return RecordingConnection(sink_dir)

    sink = jdbc.JdbcSink(
        dsn="unused",
        table="channel_stats",
        mode="additive",
        batch_size=3,
        connection_factory=factory,
    )
    rows = [(f"ch{i % 4}", i * 1000, i) for i in range(40)]
    df = spark.createDataFrame(
        rows, "channel string, timestamp long, messages long"
    ).repartition(4)
    sink(df, batch_id=7)

    import json

    files = sorted(os.listdir(out_dir))
    # one connection per non-empty partition, executor-side
    assert 2 <= len(files) <= 4
    seen = []
    for f in files:
        with open(os.path.join(out_dir, f)) as fh:
            stmts = json.load(fh)
        for s in stmts:
            assert s["sql"] == jdbc.upsert_sql("channel_stats", "additive")
            # executemany chunks respect batch_size
            assert len(s["rows"]) <= 3
            seen.extend(tuple(r) for r in s["rows"])
    # every input row written exactly once, none via the driver
    assert sorted(seen) == sorted(rows)
