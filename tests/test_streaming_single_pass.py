"""Single-pass streaming topology: ONE query maintains all five fact
tables + the matched-message side output from one persisted micro-batch
— the reference's actual dataflow shape (one Kafka consumer feeding five
aggregations + a side output, EmoteAnalyser.java:65-151)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from twitch_chat_analyser_spark import dims
from twitch_chat_analyser_spark.operators import aggregations as agg
from twitch_chat_analyser_spark.streaming import pipeline as sp

from test_streaming import BATCH_1, BATCH_2, _mk_messages, _sorted_rows, _table


@pytest.fixture()
def dirs(tmp_path):
    return (str(tmp_path / "src"), str(tmp_path / "out"), str(tmp_path / "ckpt"))


def _expected_tables(spark, rows):
    msgs = _mk_messages(spark, rows).withColumn("timestamp", F.unix_millis("ts"))
    emotes = dims.emotes_df(spark)
    phrases = dims.phrases_df(spark)
    out = {}
    for name, stats, keys in [
        ("channel_stats", agg.channel_stats(msgs), ["channel", "timestamp"]),
        ("user_stats", agg.user_stats(msgs), ["channel", "username", "timestamp"]),
        ("emote_stats", agg.emote_stats(msgs, emotes), ["channel", "emote", "timestamp"]),
        (
            "user_emote_stats",
            agg.user_emote_stats(msgs, emotes),
            ["channel", "emote", "username", "timestamp"],
        ),
        (
            "phrase_stats",
            agg.phrase_stats(msgs, phrases),
            ["channel", "phrase_name", "timestamp"],
        ),
    ]:
        value_col = [c for c in stats.columns if c not in keys][0]
        out[name] = _sorted_rows(sp.with_total_rows(stats, keys, value_col))
    out["messages_matching_phrase"] = _sorted_rows(
        agg.messages_matching_phrase(msgs, phrases)
    )
    return out


def _actual_tables(spark, out_dir):
    got = {}
    for name in [
        "channel_stats",
        "user_stats",
        "emote_stats",
        "user_emote_stats",
        "phrase_stats",
    ]:
        got[name] = _sorted_rows(_table(spark, out_dir, name))
    # side output carries a batch=<id> partition dir for replay
    # idempotence — not part of the logical schema
    matched = _table(spark, out_dir, "messages_matching_phrase").drop("batch")
    got["messages_matching_phrase"] = _sorted_rows(matched)
    return got


def test_single_pass_all_tables_with_totals_and_side_output(spark, dirs):
    src, out, ckpt = dirs
    _mk_messages(spark, BATCH_1).coalesce(1).write.mode("append").parquet(src)
    sp.run_all_single_pass(spark, src, out, ckpt)
    assert _actual_tables(spark, out) == _expected_tables(spark, BATCH_1)


def test_run_all_default_is_single_pass(spark, dirs):
    """run_all (the default topology) produces the single-pass output —
    totals sentinels, side output and all — and reports progress with
    the in-plan ingest metrics."""
    from twitch_chat_analyser_spark.streaming.observability import (
        ObservedMetricsListener,
    )

    src, out, ckpt = dirs
    _mk_messages(spark, BATCH_1).coalesce(1).write.mode("append").parquet(src)
    listener = ObservedMetricsListener("ingest")
    spark.streams.addListener(listener)
    try:
        prog = sp.run_all(spark, src, out, ckpt)
    finally:
        pass  # listener removed after polling below
    assert _actual_tables(spark, out) == _expected_tables(spark, BATCH_1)
    assert len(prog) == 1 and prog[0], "one query's progress records"
    ok = listener.wait_for(len(BATCH_1))
    spark.streams.removeListener(listener)
    assert ok, listener.batches
    assert listener.totals()["records"] == len(BATCH_1)


def test_single_pass_late_data_accumulates_and_replay_is_idempotent(spark, dirs):
    src, out, ckpt = dirs
    _mk_messages(spark, BATCH_1).coalesce(1).write.mode("append").parquet(src)
    sp.run_all_single_pass(spark, src, out, ckpt)

    # second file includes a LATE event -> adds into its old bucket and
    # the timestamp=0 sentinel keeps the running total
    _mk_messages(spark, BATCH_2).coalesce(1).write.mode("append").parquet(src)
    sp.run_all_single_pass(spark, src, out, ckpt)
    expected = _expected_tables(spark, BATCH_1 + BATCH_2)
    assert _actual_tables(spark, out) == expected

    # restart from the same checkpoint with no new data: all tables and
    # the side output unchanged (exactly-once across every sink)
    sp.run_all_single_pass(spark, src, out, ckpt)
    assert _actual_tables(spark, out) == expected


def test_single_pass_empty_batch_is_a_cheap_no_op(spark, dirs):
    """ADVICE r9 (low): in the all-flat phase an empty micro-batch must
    not drive five full flat-store rewrites — on a brand-new out_dir it
    must publish nothing, and on an existing store it must leave every
    file physically untouched."""
    import os

    src, out, ckpt = dirs

    def _tree(d):
        return sorted(
            os.path.join(r, f)
            for r, _, fs in os.walk(d)
            for f in fs
        )

    # 1) brand-new out_dir, 0-row first batch -> no stores published
    _mk_messages(spark, []).coalesce(1).write.mode("append").parquet(src)
    sp.run_all_single_pass(spark, src, out, ckpt)
    assert not os.path.isdir(out) or not os.listdir(out)

    # 2) a real batch lands, then another empty one: store files keep
    # their identity (no whole-store rewrite for zero rows)
    _mk_messages(spark, BATCH_1).coalesce(1).write.mode("append").parquet(src)
    sp.run_all_single_pass(spark, src, out, ckpt)
    before = _tree(out)
    assert before
    _mk_messages(spark, []).coalesce(1).write.mode("append").parquet(src)
    sp.run_all_single_pass(spark, src, out, ckpt)
    assert _tree(out) == before
    assert _actual_tables(spark, out) == _expected_tables(spark, BATCH_1)


def test_single_pass_builds_emote_occurrences_once_per_trigger(
    spark, dirs, monkeypatch
):
    """VERDICT r8 #3: emote_stats and user_emote_stats must share ONE
    extracted emote stream per micro-batch (EmoteAnalyser.java:98-129
    derives both from one stream) instead of each re-running the
    explode + broadcast dim join."""
    from twitch_chat_analyser_spark.operators import aggregations as agg

    calls = {"n": 0}
    real = agg.emote_occurrences

    def counting(msgs, emotes):
        calls["n"] += 1
        return real(msgs, emotes)

    monkeypatch.setattr(agg, "emote_occurrences", counting)
    src, out, ckpt = dirs
    _mk_messages(spark, BATCH_1).coalesce(1).write.mode("append").parquet(src)
    sp.run_all_single_pass(spark, src, out, ckpt)
    assert calls["n"] == 1  # one batch -> one extraction, shared by both
    assert _actual_tables(spark, out) == _expected_tables(spark, BATCH_1)


def test_single_pass_bucketed_phase_end_to_end(spark, dirs, monkeypatch):
    """The sink's bucketed phase — span aggregation pricing the
    day-bucket hint, five concurrent bucketed merges, late-data
    accumulation, replay idempotence — exercised END-TO-END through
    run_all_single_pass (the unit tests cover additive_merge alone;
    this pins the sink wiring)."""
    monkeypatch.setattr(sp, "FLAT_STORE_MAX_BYTES", 0)
    src, out, ckpt = dirs
    metrics: list = []
    _mk_messages(spark, BATCH_1).coalesce(1).write.mode("append").parquet(src)
    sp.run_all_single_pass(spark, src, out, ckpt, merge_metrics=metrics)
    # threshold 0: every store goes bucketed from the first merge
    assert {m["layout"] for m in metrics if m.get("step") == "merge"} == {
        "bucketed"
    }
    # second trigger (with a LATE event) sees bucketed stores -> the
    # span job prices the shared day-bucket hint
    _mk_messages(spark, BATCH_2).coalesce(1).write.mode("append").parquet(src)
    sp.run_all_single_pass(spark, src, out, ckpt, merge_metrics=metrics)
    assert any(m.get("step") == "span_agg" for m in metrics)
    expected = _expected_tables(spark, BATCH_1 + BATCH_2)
    assert _actual_tables(spark, out) == expected
    # replay from the same checkpoint: per-bucket journals suppress
    sp.run_all_single_pass(spark, src, out, ckpt, merge_metrics=metrics)
    assert _actual_tables(spark, out) == expected


def test_trigger_shuffle_partitions_sizing(spark):
    """Per-trigger reduce parallelism: floor of 8 for tiny triggers,
    ramps with rows (~50k/task) and store bytes (~128MB/task), and the
    session setting is a hard CAP (a 100 TB replay batch must keep the
    operator's cluster sizing, never exceed it)."""
    sess = int(spark.conf.get("spark.sql.shuffle.partitions"))
    f = sp.trigger_shuffle_partitions
    assert f(spark, 0) == 8
    assert f(spark, 25_000) == 8
    assert f(spark, 50_000 * 12) == min(sess, 12)
    assert f(spark, 10 ** 9) == sess  # capped at the session value
    assert f(spark, 0, store_bytes=20 * (128 << 20)) == min(sess, 20)
    assert f(spark, 10 ** 9, store_bytes=10 ** 15) == sess


def test_sink_conf_changes_cannot_leak_into_the_user_session(spark, dirs):
    """ADVICE r11: the sink sizes spark.sql.shuffle.partitions to the
    trigger (as low as 8); set on the user's session that silently
    throttled any concurrent batch query. The sink now runs on the
    micro-batch's CLONED session (MicroBatchExecution clones the
    session with an isolated SQLConf — batch_df.sparkSession), so the
    per-trigger value is invisible outside the stream. Also pins the
    mechanism itself: foreachBatch really does hand a distinct JVM
    session sharing the context."""
    src, out, ckpt = dirs
    _mk_messages(spark, BATCH_1).coalesce(1).write.mode("append").parquet(src)
    seen = {}

    orig_sink_probe = sp.trigger_shuffle_partitions

    def probe(sess, rows, store_bytes=0):
        # called from inside the sink with the session the sink uses
        seen["distinct_session"] = sess is not spark and (
            str(sess._jsparkSession) != str(spark._jsparkSession)
        )
        seen["shared_context"] = sess.sparkContext is spark.sparkContext
        return orig_sink_probe(sess, rows, store_bytes)

    before = spark.conf.get("spark.sql.shuffle.partitions")
    sp.trigger_shuffle_partitions, saved = probe, sp.trigger_shuffle_partitions
    try:
        sp.run_all_single_pass(spark, src, out, ckpt)
    finally:
        sp.trigger_shuffle_partitions = saved
    assert seen["distinct_session"], (
        "sink must run on the micro-batch's cloned session, not the "
        "user session"
    )
    assert seen["shared_context"]
    assert spark.conf.get("spark.sql.shuffle.partitions") == before
    # results are unaffected by the session change
    assert _actual_tables(spark, out) == _expected_tables(spark, BATCH_1)


def test_store_journals_record_the_checkpoint_identity(spark, dirs):
    """The replay journals must carry the checkpoint's stable query id
    (bucketstore.stream_identity) so a FRESH checkpoint pointed at
    this store fails loudly instead of watermark-dropping new batches
    (ADVICE r11). End-to-end through the real streaming query."""
    import json as _json
    import os

    src, out, ckpt = dirs
    _mk_messages(spark, BATCH_1).coalesce(1).write.mode("append").parquet(src)
    sp.run_all_single_pass(spark, src, out, ckpt)
    with open(os.path.join(ckpt, "single_pass", "metadata")) as fh:
        qid = _json.load(fh)["id"]
    j = os.path.join(out, "channel_stats", "_applied_batches.json")
    assert os.path.isfile(j), "flat store should carry a root journal"
    with open(j) as fh:
        rec = _json.load(fh)
    assert rec["stream"] == qid
    assert rec["ids"] == [0]
