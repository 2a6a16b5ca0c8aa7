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




def idempotent_jdbc_upsert_sink(
    url: str,
    table: str,
    key_cols: list[str],
    ledger_dir: str,
    properties: dict[str, str] | None = None,
    max_batch_keys: int = 100_000,
):
    """Exactly-once ``foreachBatch`` upsert into a JDBC table — the
    streaming x S1 seam: the reference's pg-tap sink fed by Structured
    Streaming instead of a batch job (composes :func:`io.jdbc_execute` /
    :func:`io.jdbc_append` with the batch-ledger discipline of
    :func:`idempotent_upsert_sink`).

    Per batch: DELETE the batch's key set, then append the batch's rows
    (deduped on the key). Delete-then-append is idempotent as a UNIT even
    though the two statements are separate transactions: a crash at ANY
    point (mid-delete, between the statements, mid-append — Spark's JDBC
    writer commits per partition, so partial appends exist) is healed by
    the at-least-once re-delivery, which re-deletes the same keys and
    re-inserts the same rows. The ledger marker, written only after a
    complete append, short-circuits clean re-deliveries.

    Injection safety: key VALUES never touch SQL text — the DELETE is a
    single ``?``-placeholder statement executed as a PreparedStatement
    batch (:func:`io.jdbc_execute_prepared`), so quoting/escaping is the
    JDBC driver's job on every dialect (backslash-escaping backends
    included) and non-finite floats are rejected at bind time.

    Scale: the DELETE key list is driver-collected, so batch key volume is
    guarded by ``max_batch_keys`` (raises BEFORE collecting more) —
    microbatches are bounded by trigger sizing at any scale. On a
    warehouse-grade sink, swap the delete+append pair for a staged MERGE;
    the ledger and re-delivery reasoning carry over unchanged.
    """
    from etl_cascalog_spark.io import jdbc_append, jdbc_execute_prepared

    os.makedirs(ledger_dir, exist_ok=True)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        marker = _ledger_path(ledger_dir, batch_id)
        if os.path.exists(marker):
            return  # re-delivered batch: effect already committed
        spark = batch_df.sparkSession
        batch = batch_df.dropDuplicates(key_cols)
        guard = batch.select(*key_cols).limit(max_batch_keys + 1).collect()
        if len(guard) > max_batch_keys:
            raise ValueError(
                f"idempotent_jdbc_upsert_sink: batch exceeds {max_batch_keys} "
                "distinct keys — size the trigger down or use a staged MERGE"
            )
        keys = guard
        if keys:
            delete_sql = (
                f"DELETE FROM {table} WHERE "
                + " AND ".join(f"{c} = ?" for c in key_cols)
            )
            jdbc_execute_prepared(
                spark,
                url,
                delete_sql,
                [tuple(getattr(r, c) for c in key_cols) for r in keys],
                properties,
            )
            jdbc_append(batch, url, table, properties)
        with open(marker, "w"):
            pass

    return sink
