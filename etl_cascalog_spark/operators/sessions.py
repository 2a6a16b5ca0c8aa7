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


def train_test_slices(
    events: DataFrame,
    cutoffs: DataFrame,
    key_cols: Sequence[str],
    ts_col: str = "ts",
    value_col: str | None = None,
    train_days: int = 7,
    test_days: int = 3,
) -> DataFrame:
    """Per-(key, cutoff) train/test window slicing — the reference's
    ``take-train-dts`` periodic train-window generation
    (mlvar/d_bolome_user_order_stat.clj:52-70; REPL prototype
    common/test.clj:21-39) as one declarative pass.

    ``cutoffs`` is a one-column DataFrame of cutoff dates (a date spine —
    X3). Each event joins the broadcast spine and lands in every window it
    falls into (≤ (train+test)/spacing windows, the sliding-window
    explosion factor); ONE grouped pass computes train features and test
    labels per (key, cutoff). Keys with an empty train AND empty test
    window for a cutoff are dropped.

    Scale: spine is broadcast (tiny); the only shuffle is the grouped
    aggregation on (keys, cutoff) — same shape as a sliding-window agg.
    """
    cutoff_col = cutoffs.columns[0]
    e = events.crossJoin(F.broadcast(cutoffs.select(F.col(cutoff_col).alias("cutoff"))))
    ts = F.col(ts_col)
    c_ts = F.col("cutoff").cast("timestamp")
    in_train = (ts >= F.date_sub(F.col("cutoff"), train_days).cast("timestamp")) & (ts < c_ts)
    in_test = (ts >= c_ts) & (ts < F.date_add(F.col("cutoff"), test_days).cast("timestamp"))
    aggs = [
        F.count(F.when(in_train, 1)).alias("n_train"),
        F.count(F.when(in_test, 1)).alias("n_test"),
    ]
    if value_col is not None:
        aggs.insert(
            1,
            F.sum(F.when(in_train, F.col(value_col))).alias("train_value"),
        )
    return (
        e.where(in_train | in_test)
        .groupBy(*[F.col(k) for k in key_cols], F.col("cutoff"))
        .agg(*aggs)
    )
