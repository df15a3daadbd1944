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
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import sketches


def merge_registers(
    spark: SparkSession, store: str, batch_regs: DataFrame, dims: list[str]
) -> None:
    """Key-max upsert of a batch's partial registers into the parquet
    register store (atomic directory swap, same discipline as
    pipeline.merge_upsert). Idempotent under replay by the max algebra —
    re-merging identical partials changes nothing."""
    batch_regs = batch_regs.cache()
    try:
        if os.path.isdir(store):
            old = spark.read.parquet(store)
            merged = (
                old.unionByName(batch_regs)
                .groupBy(*dims, "reg")
                .agg(F.max("mrho").alias("mrho"))
            )
        else:
            merged = batch_regs
        tmp = f"{store}.tmp-{uuid.uuid4().hex[:8]}"
        merged.write.mode("overwrite").parquet(tmp)
        back = f"{store}.old-{uuid.uuid4().hex[:8]}"
        had_old = os.path.isdir(store)
        if had_old:
            os.rename(store, back)
        os.rename(tmp, store)
        if had_old:
            shutil.rmtree(back, ignore_errors=True)
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
    touches raw events. -> *dims, hll_est"""
    return sketches.hll_estimate(spark.read.parquet(store_dir), dims or ["channel"])
