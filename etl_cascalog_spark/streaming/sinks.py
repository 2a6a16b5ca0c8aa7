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
):
    """Exactly-once ``foreachBatch`` upsert into a JDBC table — the
    streaming x S1 seam: the reference's pg-tap sink fed by Structured
    Streaming instead of a batch job (composes :func:`io.jdbc_execute` /
    :func:`io.jdbc_append` with the batch-ledger discipline of
    :func:`idempotent_upsert_sink`).

    Per batch — a staged two-phase write:

    1. reset the stage table (``DELETE FROM {table}_stage``; created by
       the first append if absent),
    2. distributed append of the batch (deduped on the key) into the
       STAGE, never the target,
    3. one server-side ``DELETE target WHERE EXISTS (stage match)`` +
       one server-side ``INSERT INTO target SELECT DISTINCT FROM stage``,
    4. ledger marker.

    Why staged (round-8, VERDICT r7 #4): Spark's JDBC writer commits per
    PARTITION and has no task-commit protocol, so a task that fails
    AFTER its commit but before reporting success (executor crash,
    preemption, speculative twin) is retried and its partition's rows
    land TWICE — inside a single "successful" append. The old
    delete-then-append wrote the target directly, so that duplicate
    survived (the job succeeds, the marker is written, re-delivery never
    happens). Staging confines the damage: retry duplicates are exact
    full-row duplicates (the batch is key-deduped first), the stage is
    the only distributed write target, and ``SELECT DISTINCT`` collapses
    them before the target is touched. Fault-injection tests drive each
    window (`tests/test_streaming.py`): duplicated stage rows, a
    mid-append constraint failure leaving a partially-committed stage,
    and a real Spark task retry (``local[N,3]``).

    Crash windows, all healed: mid-stage-append (partial stage, no
    marker → re-delivery resets the stage); between DELETE and INSERT
    (keys absent, no marker → re-delivery redoes both); after INSERT
    before marker (re-delivery deletes and re-inserts the same rows).
    The INSERT..SELECT itself is a single auto-committed statement.

    Injection safety: no data VALUES ever touch SQL text (the old
    driver-collected prepared-statement key DELETE is gone entirely) —
    only config-controlled table/column names are interpolated, and the
    driver ships no row data, so there is no driver-side key-volume
    bound to guard; microbatch sizing is the trigger's job at any scale.
    On a warehouse-grade sink the DELETE+INSERT pair becomes a MERGE
    from the same stage; the ledger and re-delivery reasoning carry
    over unchanged.

    TARGET MUST PRE-EXIST: the first batch clones the stage from the
    target's definition (``CREATE .. AS SELECT .. WITH NO DATA``), so —
    unlike a plain Spark ``jdbc`` append, which auto-creates its table —
    this sink needs ``table`` created up front (:func:`io.jdbc_execute`
    DDL, or the S8 ``create_table_if`` lifecycle). A missing target is
    probed before the stage clone and raises a clear error naming the
    TARGET, instead of the confusing stage-side table-not-found the
    clone DDL would surface.
    """
    from etl_cascalog_spark.io import jdbc_append, jdbc_execute, jdbc_table_exists

    os.makedirs(ledger_dir, exist_ok=True)
    stage = f"{table}_stage"
    # correlation-safe bare name for the outer table in the EXISTS
    tname = table.split(".")[-1]

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        marker = _ledger_path(ledger_dir, batch_id)
        if os.path.exists(marker):
            return  # re-delivered batch: effect already committed
        spark = batch_df.sparkSession
        batch = batch_df.dropDuplicates(key_cols)
        if jdbc_table_exists(spark, url, stage, properties):
            jdbc_execute(spark, url, f"DELETE FROM {stage}", properties)
        else:
            if not jdbc_table_exists(spark, url, table, properties):
                raise RuntimeError(
                    f"idempotent_jdbc_upsert_sink: target table {table!r} "
                    "does not exist — this sink clones its stage from the "
                    "target's definition, so the target must be created "
                    "up front (unlike a plain Spark jdbc append, which "
                    "auto-creates). Create it via jdbc_execute DDL or the "
                    "create_table_if lifecycle before starting the stream."
                )
            # clone the TARGET's definition (CREATE..AS..WITH NO DATA is
            # both Derby and PG syntax) so identifier case-folding matches
            # the target exactly — letting Spark create the stage would
            # quote-preserve the DataFrame's lowercase names while an
            # unquoted-DDL target folds, and the merge SQL would need
            # per-side quoting
            jdbc_execute(
                spark,
                url,
                f"CREATE TABLE {stage} AS SELECT * FROM {table} WITH NO DATA",
                properties,
            )
        jdbc_append(batch, url, stage, properties)
        _merge_stage_into_target(
            spark, url, table, tname, stage, list(batch.columns), key_cols, properties
        )
        with open(marker, "w"):
            pass

    return sink


def _merge_stage_into_target(
    spark,
    url: str,
    table: str,
    tname: str,
    stage: str,
    cols: list[str],
    key_cols: list[str],
    properties: dict[str, str] | None,
) -> None:
    """Server-side merge of a fully-staged batch into the target: delete
    matching keys, insert the stage's DISTINCT rows. Tolerates exact-row
    duplicates in the stage (the artifact a post-commit task retry or a
    speculative twin leaves behind) — unit-tested directly against a
    stage containing duplicated rows."""
    from etl_cascalog_spark.io import jdbc_execute

    pred = " AND ".join(f"s.{c} = {tname}.{c}" for c in key_cols)
    jdbc_execute(
        spark,
        url,
        f"DELETE FROM {table} WHERE EXISTS (SELECT 1 FROM {stage} s WHERE {pred})",
        properties,
    )
    collist = ", ".join(cols)
    jdbc_execute(
        spark,
        url,
        f"INSERT INTO {table} ({collist}) SELECT DISTINCT {collist} FROM {stage}",
        properties,
    )
