"""Streaming KMV store: stream == batch bit-for-bit across batchings,
replay no-op by algebra, bounded state, live overlap serving."""

from __future__ import annotations

import pyspark.sql.functions as F

from twitch_chat_analyser_spark.operators import sketches
from twitch_chat_analyser_spark.streaming import kmv

SCHEMA = "ts timestamp, channel string, username string, message string"


def _msgs(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _sorted_rows(df):
    return sorted(map(tuple, df.collect()))


def test_incremental_equals_full_and_replay_noop(spark, tmp_path):
    path = str(tmp_path / "kmv_store")
    b1 = _msgs(spark, [(None, "a", f"u{i}", "m") for i in range(120)])
    b2 = _msgs(
        spark,
        [(None, "a", f"u{i}", "m") for i in range(60, 180)]
        + [(None, "b", f"u{i}", "m") for i in range(50)],
    )
    kmv.merge_kmv(spark, path, b1, k=64)
    kmv.merge_kmv(spark, path, b2, k=64)
    got = _sorted_rows(spark.read.parquet(path).drop("bucket"))
    full = sketches.kmv_kmin(b1.unionByName(b2), k=64)
    assert got == _sorted_rows(full)
    # replaying batch 2 changes NOTHING — min-merge on distinct values
    # is idempotent, no journal required
    kmv.merge_kmv(spark, path, b2, k=64)
    assert _sorted_rows(spark.read.parquet(path).drop("bucket")) == got
    # bounded state: <= k rows per channel
    per = (
        spark.read.parquet(path).drop("bucket")
        .groupBy("channel")
        .count()
        .collect()
    )
    assert all(r["count"] <= 64 for r in per)


def test_stream_pipeline_estimates_and_overlap_match_batch(spark, tmp_path):
    rows1 = [(None, "a", f"u{i}", "m") for i in range(300)]
    rows2 = [(None, "b", f"u{i}", "m") for i in range(150, 450)]
    src = str(tmp_path / "src")
    _msgs(spark, rows1).coalesce(1).write.mode("append").parquet(src)
    _msgs(spark, rows2).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = str(tmp_path / "store")
    q = kmv.start_kmv_pipeline(
        spark, stream, out, str(tmp_path / "ckpt"), k=64
    )
    q.awaitTermination(120)

    full = _msgs(spark, rows1 + rows2)
    # overlap estimates off the maintained store == the batch operator
    got = _sorted_rows(kmv.serve_overlap(spark, out, k=64))
    want = _sorted_rows(sketches.kmv_overlap(full, k=64))
    assert got == want
    # per-channel estimates present for both channels
    ests = {r["channel"]: r["est_milli"]
            for r in kmv.serve_estimates(spark, out, k=64).collect()}
    assert set(ests) == {"a", "b"}
    # within KMV error at k=64 (est_milli is the estimate x1000)
    assert abs(ests["a"] / 1000 - 300) / 300 < 0.5


def test_torn_swap_recovery_restores_history(spark, tmp_path):
    import os

    path = str(tmp_path / "store")
    b1 = _msgs(spark, [(None, "a", f"u{i}", "m") for i in range(100)])
    kmv.merge_kmv(spark, path, b1, k=64)
    before = _sorted_rows(spark.read.parquet(path).drop("bucket"))
    # simulate a crash between the two swap renames: live dir gone,
    # backup stranded
    os.rename(path, path + ".old-deadbeef")
    # any subsequent read or merge must restore the stranded history
    got = _sorted_rows(kmv.serve_estimates(spark, path, k=64))
    assert len(got) == 1
    assert _sorted_rows(spark.read.parquet(path).drop("bucket")) == before


def test_kmv_merge_rewrites_only_touched_buckets(spark, tmp_path):
    """The point of the review-r9 port onto bucketstore: a batch
    touching one channel rewrites only that channel's bucket — the old
    flat layout rewrote the WHOLE store every trigger."""
    from test_bucketstore import _bucket_files

    path = str(tmp_path / "store")
    chans = [f"c{i}" for i in range(8)]
    b1 = _msgs(
        spark,
        [(None, ch, f"u{i}", "m") for ch in chans for i in range(20)],
    )
    kmv.merge_kmv(spark, path, b1, k=16, num_buckets=8)
    before = _bucket_files(path)
    assert len(before) >= 3  # channels spread across several buckets

    b2 = _msgs(spark, [(None, "c0", f"v{i}", "m") for i in range(30)])
    kmv.merge_kmv(spark, path, b2, k=16, num_buckets=8)
    after = _bucket_files(path)
    changed = [b for b in before if after.get(b) != before[b]]
    assert len(changed) == 1  # exactly c0's bucket rewritten
    # and the result still equals the from-scratch batch sketch
    got = _sorted_rows(spark.read.parquet(path).drop("bucket"))
    want = _sorted_rows(sketches.kmv_kmin(b1.unionByName(b2), k=16))
    assert got == want


def test_kmv_legacy_flat_store_is_migrated(spark, tmp_path):
    """A store written by the old flat layout folds into buckets on the
    first merge, with estimates exact before, during, and after."""
    import os

    from twitch_chat_analyser_spark.streaming import bucketstore
    from twitch_chat_analyser_spark.streaming.storeswap import swap_in

    path = str(tmp_path / "store")
    b1 = _msgs(spark, [(None, "a", f"u{i}", "m") for i in range(100)])
    swap_in(sketches.kmv_kmin(b1, k=64), path)  # pre-bucketing layout
    assert bucketstore._legacy_flat_files(path)
    # serve answers from the flat store before any merge
    assert {r["channel"] for r in
            kmv.serve_estimates(spark, path, k=64).collect()} == {"a"}

    b2 = _msgs(spark, [(None, "b", f"u{i}", "m") for i in range(80)])
    kmv.merge_kmv(spark, path, b2, k=64)
    assert not bucketstore._legacy_flat_files(path)
    assert all(
        e.startswith("bucket=")
        for e in os.listdir(path)
        if not e.startswith((".", "_"))
    )
    got = _sorted_rows(spark.read.parquet(path).drop("bucket"))
    want = _sorted_rows(sketches.kmv_kmin(b1.unionByName(b2), k=64))
    assert got == want


def test_kmv_serve_exact_in_migration_crash_window(spark, tmp_path):
    """ADVICE r9: between a crash in the migration swap loop and the
    next merge, a folded-and-marked bucket coexists with the legacy
    flat files. Evicted legacy hv values are NOT identical rows, so
    distinct() alone cannot collapse them — the serve read must drop
    the folded legacy rows via the writer's bucket assignment (plus the
    bottom-k belt) or n/hk is computed over a >k mixture."""
    import shutil

    from twitch_chat_analyser_spark.streaming import bucketstore
    from twitch_chat_analyser_spark.streaming.storeswap import swap_in

    path = str(tmp_path / "store")
    k = 8
    b1 = _msgs(spark, [(None, "a", f"u{i}", "m") for i in range(50)])
    swap_in(sketches.kmv_kmin(b1, k=k), path)  # pre-bucketing layout
    flat_before = bucketstore._legacy_flat_files(path)
    assert flat_before
    saved = str(tmp_path / "saved-flat")
    import os

    os.makedirs(saved)
    for f in flat_before:
        shutil.copy(f, saved)

    # the merge folds the legacy rows into marked buckets; new users
    # hash below some legacy values, so the fold EVICTS legacy rows
    b2 = _msgs(spark, [(None, "a", f"v{i}", "m") for i in range(50)])
    kmv.merge_kmv(spark, path, b2, k=k)
    assert bucketstore._marked_buckets(path)
    truth_est = _sorted_rows(kmv.serve_estimates(spark, path, k=k))
    truth_rows = _sorted_rows(_read_sketch_rows(spark, path, k))
    want = _sorted_rows(
        sketches.kmv_kmin(b1.unionByName(b2), k=k).select("channel", "hv")
    )
    assert truth_rows == want

    # resurrect the flat files: the exact crash-window state
    for f in os.listdir(saved):
        shutil.copy(os.path.join(saved, f), path)
    assert bucketstore._legacy_flat_files(path)
    assert _sorted_rows(_read_sketch_rows(spark, path, k)) == want
    assert _sorted_rows(kmv.serve_estimates(spark, path, k=k)) == truth_est
    assert _sorted_rows(kmv.serve_overlap(spark, path, k=k)) == _sorted_rows(
        sketches.kmv_overlap_from_sketch(
            sketches.kmv_kmin(b1.unionByName(b2), k=k), k
        )
    )


def _read_sketch_rows(spark, path, k):
    return kmv._read_sketch(spark, path, k).select("channel", "hv")
