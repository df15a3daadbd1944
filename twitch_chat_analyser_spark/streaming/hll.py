"""Incremental distinct-count maintenance: the portable HLL's register
table as a streaming-maintained serving store.

The register representation (operators/sketches.py::hll_registers) is
MAX-MERGEABLE: ``max`` is idempotent, commutative and associative, so

- each micro-batch contributes only its own partial register maxima
  (map-side agg, 256 rows per dimension key — no raw usernames ever
  reach the store);
- merging a batch into the store is a key-max upsert whose REPLAY is a
  no-op by algebra alone — no batch-id journal or ledger needed, unlike
  the additive count sinks (streaming/pipeline.py), because
  ``max(store, batch)`` applied twice equals applied once;
- the serving estimate read from the store after any prefix of batches
  equals the batch computation over the same prefix EXACTLY (pytest
  pins stream == batch bit-for-bit), and any coarser rollup re-merges
  the same registers.

This is the streaming twin of the reference's flush-and-accumulate
pattern (AbstractStatsAggregation.java:108-112) applied to a
non-additive measure: the stream plan stays stateless, long-term state
lives in the store as 2 KB of registers per key instead of the
unbounded distinct-key set.

STORE LAYOUT — per-trigger cost must be O(batch), not O(store): the
store is laid out as ``bucket=<hash(dims) % N>/`` partitions, and each
merge (1) computes which buckets the batch touches (at most N tiny
ints), (2) reads ONLY those partitions (partition pruning — the rest of
the store is never opened), (3) key-max re-aggregates them with the
batch, and (4) swaps only the touched bucket directories. A batch
touching one dimension key rewrites 1/N of the store regardless of how
many keys history has accumulated — the same per-flush-proportional-to-
delta property the reference's accumulate loop has
(AbstractStatsAggregation.java:108-112). Crash safety: buckets that
fully swapped are replay-no-ops by the max algebra; a crash INSIDE one
bucket's two-rename swap strands a ``.old-`` backup, which ``_recover``
restores (live dir missing) or discards (live dir present) before the
next merge or serve — so no bucket's history is ever lost to a torn
swap. Stores written by the earlier flat (unbucketed) layout are
migrated into buckets on the first merge that sees them.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import sketches

# Default bucket fan-out for the register store. At 100 TB-scale key
# cardinality this is sized so one bucket's registers fit an executor
# core comfortably (keys/N * 256 rows); tests use small N to exercise
# multi-key buckets.
STORE_BUCKETS = 16


def _with_bucket(regs: DataFrame, dims: list[str], num_buckets: int) -> DataFrame:
    return regs.withColumn(
        "bucket", F.pmod(F.hash(*dims), F.lit(num_buckets)).cast("int")
    )


def _recover(store: str) -> None:
    """Make an interrupted bucket swap whole before reading or merging.

    The swap sequence is rename(live -> backup), rename(tmp -> live),
    delete(backup); a crash can strand a backup whose live dir is
    missing (restore it — that bucket's history would otherwise be
    lost) or whose live dir exists (the new dir already superseded it —
    drop the stale backup). Leftover ``.tmp-*`` write dirs are always
    stale (the merge that made them never swapped them all in) and are
    removed; checkpoint replay re-merges that batch, and the max
    algebra makes the re-merge a no-op for buckets that DID swap."""
    parent = os.path.dirname(os.path.abspath(store)) or "."
    base = os.path.basename(store)
    if not os.path.isdir(parent):
        return
    for entry in os.listdir(parent):
        full = os.path.join(parent, entry)
        if entry.startswith(f"{base}.old-") and "-b" in entry:
            bucket = entry.rsplit("-b", 1)[1]
            live = os.path.join(store, f"bucket={bucket}")
            if bucket.isdigit() and not os.path.isdir(live):
                os.makedirs(store, exist_ok=True)
                os.rename(full, live)
            else:
                shutil.rmtree(full, ignore_errors=True)
        elif entry.startswith(f"{base}.tmp-"):
            shutil.rmtree(full, ignore_errors=True)


def _legacy_flat_files(store: str) -> list[str]:
    """Parquet part files written by the pre-bucketing flat layout,
    sitting directly under the store root. They must be folded into the
    bucketed layout (not silently ignored next to ``bucket=`` dirs —
    mixed depths also break partition discovery on read)."""
    if not os.path.isdir(store):
        return []
    return [
        os.path.join(store, e)
        for e in os.listdir(store)
        if os.path.isfile(os.path.join(store, e))
        and not e.startswith((".", "_"))
    ]


def merge_registers(
    spark: SparkSession,
    store: str,
    batch_regs: DataFrame,
    dims: list[str],
    num_buckets: int = STORE_BUCKETS,
) -> None:
    """Key-max upsert of a batch's partial registers into the bucketed
    parquet register store. Only the ``bucket=`` partitions the batch
    touches are read and rewritten (atomic per-bucket directory swap,
    same rename discipline as pipeline.merge_upsert); untouched buckets'
    files are never opened. Idempotent under replay by the max algebra —
    re-merging identical partials changes nothing."""
    _recover(store)
    batch_regs = _with_bucket(batch_regs, dims, num_buckets).cache()
    try:
        touched = sorted(
            r["bucket"] for r in batch_regs.select("bucket").distinct().collect()
        )
        if not touched:  # empty micro-batch
            return
        parts = [batch_regs]
        legacy = _legacy_flat_files(store)
        if legacy:
            # one-time migration from the pre-bucketing flat layout:
            # fold EVERY flat row into the bucketed merge (whatever
            # buckets they hash to), then drop the flat files after the
            # swap — ignoring them would silently lose history AND
            # leave mixed directory depths that break partition
            # discovery on the next read
            parts.append(
                _with_bucket(spark.read.parquet(*legacy), dims, num_buckets)
            )
        # partition pruning: only the touched bucket directories are
        # listed/read — per-trigger IO is O(touched), not O(store).
        # Bucket dirs are enumerated explicitly (with basePath so the
        # partition column survives) because during a legacy migration
        # the root still holds flat files at a different depth.
        if legacy:
            touched = sorted(
                {
                    r["bucket"]
                    for p in parts
                    for r in p.select("bucket").distinct().collect()
                }
            )
        bucket_dirs = [
            os.path.join(store, f"bucket={b}")
            for b in touched
            if os.path.isdir(os.path.join(store, f"bucket={b}"))
        ]
        if bucket_dirs:
            parts.append(
                spark.read.option("basePath", store).parquet(*bucket_dirs)
            )
        merged = parts[0]
        for p in parts[1:]:
            merged = merged.unionByName(p)
        merged = merged.groupBy(*dims, "reg", "bucket").agg(
            F.max("mrho").alias("mrho")
        )
        tmp = f"{store}.tmp-{uuid.uuid4().hex[:8]}"
        merged.write.partitionBy("bucket").mode("overwrite").parquet(tmp)
        os.makedirs(store, exist_ok=True)
        for b in touched:
            src = os.path.join(tmp, f"bucket={b}")
            dst = os.path.join(store, f"bucket={b}")
            if not os.path.isdir(src):
                continue  # bucket produced no rows (can't happen; safety)
            back = f"{store}.old-{uuid.uuid4().hex[:8]}-b{b}"
            had_old = os.path.isdir(dst)
            if had_old:
                os.rename(dst, back)  # backup lives OUTSIDE the store dir
            os.rename(src, dst)
            if had_old:
                shutil.rmtree(back, ignore_errors=True)
        shutil.rmtree(tmp, ignore_errors=True)
        for f in legacy:  # after a successful swap the history is bucketed
            try:
                os.remove(f)
            except OSError:
                pass
    finally:
        batch_regs.unpersist()


def start_hll_maintenance(
    spark: SparkSession,
    messages_stream: DataFrame,
    store_dir: str,
    checkpoint_dir: str,
    dims: list[str] | None = None,
    trigger: dict | None = None,
):
    """Maintain the register store from a message stream: per trigger,
    aggregate the micro-batch's registers (batch-mode duality D4 — the
    same pure ``hll_registers`` transform) and key-max merge them in.
    The streaming plan itself has zero stateful operators."""
    dims = dims or ["channel"]

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        merge_registers(
            spark, store_dir, sketches.hll_registers(batch_df, dims), dims
        )

    return (
        messages_stream.writeStream.outputMode("append")
        .option("checkpointLocation", os.path.join(checkpoint_dir, "hll"))
        .foreachBatch(sink)
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )


def serve_estimates(
    spark: SparkSession, store_dir: str, dims: list[str] | None = None
) -> DataFrame:
    """Serving read: estimate straight off the stored registers — never
    touches raw events. Restores any interrupted bucket swap first and
    reads flat legacy files alongside bucket partitions if a migration
    hasn't folded them in yet. -> *dims, hll_est"""
    _recover(store_dir)
    dims = dims or ["channel"]
    legacy = _legacy_flat_files(store_dir)
    buckets = [
        os.path.join(store_dir, e)
        for e in (os.listdir(store_dir) if os.path.isdir(store_dir) else [])
        if e.startswith("bucket=")
    ]
    if legacy and buckets:
        regs = spark.read.parquet(*legacy).unionByName(
            spark.read.option("basePath", store_dir)
            .parquet(*buckets)
            .drop("bucket")
        )
    else:
        regs = spark.read.parquet(store_dir)
    return sketches.hll_estimate(regs, dims)
