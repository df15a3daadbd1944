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
