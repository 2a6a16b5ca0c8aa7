"""Incremental-load / watermark machinery (SURVEY.md §2.9, I1-I5).

The reference's "incrementality" is watermark-style batch reload:

- ``report->next-dt`` (trgx.clj:110-116): next load window =
  ``[max(dw_dt in sink) + 1 day, tomorrow)``, with an empty-sink fallback of
  1970-01-01;
- ``save-and-load-rng-dt!`` (trgx.clj:130-164): audit row (min/max dt+ts,
  row count) appended to a ``*_rng`` bookkeeping table;
- delta → shadow → live merge (model/d_bolome_order_show_debut.clj:61-99):
  recompute the delta aggregate, full-outer-merge into the live aggregate,
  atomically swap.

Scale: the watermark probe is a tiny agg on the sink (partition-pruned when
the sink is date-partitioned); the delta merge shuffles only the delta +
affected live keys, never the full history.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_cascalog_spark.operators.joins import full_outer_coalesce

EPOCH = "1970-01-01"


def next_load_range(sink: DataFrame, date_col: str = "dw_dt") -> tuple[str, str]:
    """I1 ``report->next-dt`` (trgx.clj:110-116): [max(dw_dt)+1, tomorrow).

    Empty sink → 1970-01-01 (the reference's epoch fallback). One tiny
    driver-side agg — identical role to the reference's separate ``??<-``
    collect-query, but partition-pruned if the sink is date-partitioned.
    """
    row = sink.agg(
        F.date_add(F.max(F.col(date_col).cast("date")), 1).alias("start"),
        F.date_add(F.current_date(), 1).alias("end"),
    ).collect()[0]
    start = row["start"].isoformat() if row["start"] is not None else EPOCH
    end = row["end"].isoformat()
    return start, end


def filter_to_range(df: DataFrame, date_col: str, start: str, end: str) -> Column:
    """The source-side watermark filter — pushed down into the scan."""
    c = F.col(date_col).cast("date")
    return df.where((c >= F.lit(start).cast("date")) & (c < F.lit(end).cast("date")))


def load_range_audit(df: DataFrame, date_col: str, ts_col: str | None = None) -> DataFrame:
    """I2 ``save-and-load-rng-dt!`` (trgx.clj:130-164): the bookkeeping row —
    min/max load date (and ts), row count, load timestamp. Returned as a
    1-row DataFrame to append to the ``*_rng`` table."""
    aggs = [
        F.min(F.col(date_col).cast("date")).cast("string").alias("dw_start_dt"),
        F.max(F.col(date_col).cast("date")).cast("string").alias("dw_end_dt"),
        F.count("*").alias("dw_ld_cnt"),
        F.date_format(F.current_timestamp(), "yyyy-MM-dd HH:mm:ss").alias("dw_ld_ts"),
        F.lit("1").alias("dw_in_use"),
    ]
    if ts_col is not None:
        aggs[2:2] = [
            F.min(F.col(ts_col)).cast("string").alias("dw_start_ts"),
            F.max(F.col(ts_col)).cast("string").alias("dw_end_ts"),
        ]
    return df.agg(*aggs)


def delta_shadow_merge(
    live: DataFrame,
    delta: DataFrame,
    keys: Sequence[str],
    combine: dict[str, Callable[[Column, Column], Column]] | None = None,
) -> DataFrame:
    """I4: the delta → shadow merge (model/d_bolome_order_show_debut.clj:61-99).

    The delta aggregate (recomputed from the reload window only) is
    full-outer-merged with the live aggregate. Columns listed in ``combine``
    get a custom merge fn (live_col, delta_col) -> Column (e.g. set-union of
    pay-date maps, ``merge-with union`` at model/…debut.clj:91); all other
    shared columns take delta-wins coalesce (or-tuple semantics).

    The caller publishes the result atomically (io.publish_atomic — the
    reference's 3-way table rename, S12).
    """
    combine = combine or {}
    lcols = set(live.columns)
    shared = [c for c in live.columns if c in set(delta.columns) and c not in keys]
    l, d = live, delta
    for c in shared:
        l = l.withColumnRenamed(c, f"__live_{c}")
        d = d.withColumnRenamed(c, f"__delta_{c}")
    joined = d.join(l, on=list(keys), how="full")
    sel = [F.col(k) for k in keys]
    for c in shared:
        lc, dc = F.col(f"__live_{c}"), F.col(f"__delta_{c}")
        if c in combine:
            sel.append(combine[c](lc, dc).alias(c))
        else:
            sel.append(F.coalesce(dc, lc).alias(c))
    for c in delta.columns:
        if c not in lcols and c not in keys:
            sel.append(F.col(c))
    return joined.select(*sel)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str],
) -> DataFrame:
    """Table-snapshot diff — the CDC-GENERATION side (what Delta/Iceberg
    change-data-feed computes, derived here from two plain snapshots):
    classify every key as added / removed / changed by comparing a digest
    of ``compare_cols``; unchanged keys are dropped.

    Returns ``(*key_cols, change, old_digest, new_digest)``.

    100 TB shape: both sides project to (key, md5 digest) BEFORE the join —
    the shuffle carries ~48 bytes/row regardless of table width; the
    full-outer join on the key is the one unavoidable co-location (SMJ,
    same class as the stg⋈ods merges — full-outer cannot broadcast). With
    both snapshots bucket-written on the key (io.write_bucketed) the
    Exchange disappears entirely.
    """
    def digested(df: DataFrame, alias: str) -> DataFrame:
        parts = [
            F.coalesce(F.col(c).cast("string"), F.lit("\x00"))
            for c in compare_cols
        ]
        return df.select(
            *key_cols, F.md5(F.concat_ws("\x1f", *parts)).alias(alias)
        )

    o = digested(old, "old_digest")
    n = digested(new, "new_digest")
    joined = o.join(n, on=list(key_cols), how="full_outer")
    change = (
        F.when(F.col("old_digest").isNull(), F.lit("added"))
        .when(F.col("new_digest").isNull(), F.lit("removed"))
        .when(F.col("old_digest") != F.col("new_digest"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        joined.withColumn("change", change)
        .where(F.col("change") != "unchanged")
        .select(*key_cols, "change", "old_digest", "new_digest")
    )


def cdc_apply(
    base: DataFrame,
    changes: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    op_col: str = "op",
) -> DataFrame:
    """CDC APPLY — the consume side (Debezium-style I/U/D log folded into a
    keyed table, i.e. MERGE INTO semantics without a table format): per key,
    the LATEST change by ``ts_col`` wins; 'D' deletes the key, 'I'/'U'
    upsert the change row's values. Base rows with no change pass through.

    ``changes`` must carry the base's value columns plus ``op_col`` and
    ``ts_col``; ties on ``ts_col`` break by preferring the higher
    operation ordering ('U' > 'I' > 'D' alphabetically reversed is NOT
    meaningful — supply unique timestamps or a sequence column as
    ``ts_col``).

    100 TB shape: one shuffle on the key for the latest-change window
    (delta-sized, not base-sized); the base is touched by a broadcast
    anti-join on the (tiny, ids-only) changed-key set, so the full history
    never re-shuffles — same delta-driven posture as ``incremental_dedup``
    and ``delta_shadow_merge``.
    """
    from pyspark.sql import Window

    keys = list(key_cols)
    w = Window.partitionBy(*keys).orderBy(F.col(ts_col).desc())
    latest = (
        changes.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
    changed_keys = latest.select(*keys)
    survivors = base.join(F.broadcast(changed_keys), on=keys, how="left_anti")
    upserts = latest.where(F.col(op_col) != "D").drop(op_col, ts_col)
    return survivors.unionByName(upserts)
