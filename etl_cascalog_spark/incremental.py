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
