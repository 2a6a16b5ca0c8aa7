"""Sessionization & event-time windows (batch formulations).

Absent from the reference (it is batch-only, SURVEY §2.9 I6); this is part of
the beyond-reference streaming surface expressed so the same semantics run in
batch (oracle-checkable) and in Structured Streaming
(:mod:`etl_cascalog_spark.streaming`).

Scale: both operators are one shuffle on the grouping key; sessionization
sorts within the key partition (window lag + running sum — the classic
gaps-and-islands plan, which AQE handles for skewed users via skew-join-style
partition splitting on the shuffle).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def tumbling_window(
    df: DataFrame,
    ts_col: str,
    duration: str,
    group_cols: Sequence[str] = (),
    aggs: Sequence[Column] = (),
) -> DataFrame:
    """Tumbling event-time window aggregation (batch twin of
    ``groupBy(F.window(ts, duration))``). Emits ``window_start``/
    ``window_end`` as plain timestamps."""
    w = F.window(F.col(ts_col), duration)
    out = df.groupBy(w, *[F.col(c) for c in group_cols]).agg(*aggs)
    return out.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *[c for c in out.columns if c != "window"],
    )


def sliding_window(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    group_cols: Sequence[str] = (),
    aggs: Sequence[Column] = (),
) -> DataFrame:
    """Sliding (hopping) event-time window aggregation — each event lands in
    ``duration/slide`` overlapping windows (``F.window(ts, duration, slide)``
    explodes map-side, so the only shuffle is the grouped aggregation, same
    as tumbling). Streaming twin: identical expression under readStream
    with a watermark."""
    w = F.window(F.col(ts_col), duration, slide)
    out = df.groupBy(w, *[F.col(c) for c in group_cols]).agg(*aggs)
    return out.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *[c for c in out.columns if c != "window"],
    )


def sessionize(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    gap: str = "30 minutes",
) -> DataFrame:
    """Gaps-and-islands sessionization: a new session starts when the gap to
    the previous event of the same key exceeds ``gap``.

    Returns the input plus ``session_id`` (1-based per key). The streaming
    twin is ``F.session_window`` (streaming/windows.py) — identical session
    boundaries; here session_end is ``max(ts)`` not ``max(ts)+gap``.
    """
    keys = [F.col(c) for c in key_cols]
    w = Window.partitionBy(*keys).orderBy(F.col(ts_col))
    gap_expr = F.expr(f"INTERVAL {gap}")
    prev = F.lag(F.col(ts_col)).over(w)
    is_new = (prev.isNull() | (F.col(ts_col) > prev + gap_expr)).cast("int")
    return df.withColumn("__new", is_new).withColumn(
        "session_id",
        F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    ).drop("__new")


def session_stats(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    gap: str = "30 minutes",
) -> DataFrame:
    """Per-session rollup: start/end/event count. One extra grouped pass over
    :func:`sessionize` (same shuffle key → no extra exchange after AQE
    reuses the partitioning)."""
    s = sessionize(df, key_cols, ts_col, gap)
    return s.groupBy(*[F.col(c) for c in key_cols], F.col("session_id")).agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count("*").alias("n_events"),
    )
