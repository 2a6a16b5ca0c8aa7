"""Exactly-once ``foreachBatch`` sinks over plain parquet.

Structured Streaming's delivery guarantee to ``foreachBatch`` is
AT-LEAST-ONCE: after a crash between the sink's side effect and the
checkpoint commit, the SAME ``batch_id`` is re-delivered with the same
data. A bare ``mode("append")`` sink therefore duplicates rows on
recovery (the production bug the reference's Hadoop jobs sidestepped by
being batch-only — parity surface is streaming, so the engine carries the
fix). The standard remedy, straight from the Spark docs' "idempotent
writes using batchId" guidance, is to make the side effect a pure
function of ``batch_id``:

- a **batch ledger** (one empty marker file per committed batch id)
  short-circuits re-deliveries — the second delivery of batch N sees the
  marker and returns without touching data;
- the data write itself goes through :func:`io.publish_atomic`, so a
  crash mid-write never leaves a half-visible table (readers see the old
  version until the symlink flips), and the marker is only written AFTER
  the publish — re-delivery after a mid-write crash redoes the whole
  batch against the still-intact old version.

Together: at-least-once delivery x idempotent effect = exactly-once
table state.

At 100 TB the same structure holds: the ledger is one tiny object per
microbatch (object-store put), the upsert is the normal keyed anti-join
merge, and the atomic flip is whatever the table format provides
(Delta/Iceberg transactional commit instead of the symlink).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_cascalog_spark.io import publish_atomic, recover_publish


def _ledger_path(ledger_dir: str, batch_id: int) -> str:
    return os.path.join(ledger_dir, f"batch-{batch_id}.committed")


def idempotent_upsert_sink(path: str, key_cols: list[str], ledger_dir: str):
    """Build a ``foreachBatch`` function that upserts each microbatch into
    the parquet table at ``path``, keyed on ``key_cols`` (batch rows win
    over stored rows; within a batch, rows are deduped on the key first so
    re-partitioned duplicates cannot double-apply).

    Exactly-once: re-delivery of an already-committed ``batch_id`` is a
    no-op (ledger check), and the merge publishes atomically before the
    ledger marker is written.
    """
    os.makedirs(ledger_dir, exist_ok=True)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        marker = _ledger_path(ledger_dir, batch_id)
        if os.path.exists(marker):
            return  # re-delivered batch: effect already committed
        spark = batch_df.sparkSession
        batch = batch_df.dropDuplicates(key_cols)
        # first-batch is detected EXPLICITLY (no published table yet, after
        # attempting symlink recovery) — a transient read failure on an
        # EXISTING table must propagate so the engine retries the batch,
        # NOT silently truncate the table to one microbatch's rows
        recover_publish(path)
        if os.path.lexists(path):
            current = spark.read.parquet(path)
            keep = current.join(batch.select(*key_cols), on=key_cols, how="left_anti")
            merged = keep.unionByName(batch)
        else:
            merged = batch  # genuinely the first batch: nothing published yet
        publish_atomic(merged, path)
        with open(marker, "w"):
            pass

    return sink
