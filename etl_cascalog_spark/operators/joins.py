"""Joins (SURVEY.md §2.4, J1-J6).

Cascalog has no join operator — joins are implicit unification on shared
variable names, with nullability markers picking the join type:

- shared ``?var`` across generators  → inner equi-join (J1)
- probe side bound to ``!!vars``     → left outer (J2)
- both sides ``!!`` + ``or-tuple``   → full outer + field-wise COALESCE (J3)
- literal-seq cross join             → cartesian date-spine (J4)
- plan-time config fetch             → broadcast map-side join (J5)

Scale notes (100 TB posture):

- Dimension lookups (J2) take an explicit ``F.broadcast`` hint: nation /
  region / config trees are KB-MB sized even at 100 TB fact scale, so they
  must never shuffle the fact side.
- Star joins (J1) rely on AQE for join reordering + skew splitting; the
  fact table shuffles at most once per distinct join key.
- ``salted_join`` handles the hot-key case AQE can't fully fix (a single
  key holding >> one partition of rows on the *build* side).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from etl_cascalog_spark.functions.conditionals import or_tuple


def star_join(
    fact: DataFrame,
    dims: Sequence[tuple[DataFrame, Sequence[str] | str, str]],
    broadcast_dims: bool = True,
) -> DataFrame:
    """J1: N-way star join — the mlin feature-assembly shape
    (``src/bolome/mlin/d_bolome_user_order.clj:73-86``:
    orders ⋈ event ⋈ debut ⋈ category).

    ``dims`` is a list of (dim_df, on, how) or (dim_df, on, how,
    broadcast). BOUNDED dims (config tables, nation/region) get a
    broadcast hint so the fact side never shuffles for them; a dim that
    SCALES with the corpus (customer past test SF) must pass
    ``broadcast=False`` — a mandatory hint bypasses
    autoBroadcastJoinThreshold, and at 100 TB that side is GBs (the
    SCALE.md "never force-broadcast the dup population" discipline
    applies to growing dimensions too; AQE still broadcasts such a dim
    at runtime when it actually fits).
    """
    out = fact
    for spec in dims:
        dim, on, how = spec[0], spec[1], spec[2]
        bc = spec[3] if len(spec) > 3 else broadcast_dims
        d = F.broadcast(dim) if bc else dim
        out = out.join(d, on=on, how=how)
    return out


def left_lookup(fact: DataFrame, dim: DataFrame, on, broadcast: bool = True) -> DataFrame:
    """J2: the ``!!var`` probe — lookup that may miss
    (mlin:81 ``!!type-name``, :84 ``!!show-debut-dt``).

    ``broadcast=True`` is for BOUNDED dims only (config/nation-class);
    pass ``broadcast=False`` for any dim that scales with the data —
    the planner still broadcasts it at runtime while it fits."""
    d = F.broadcast(dim) if broadcast else dim
    return fact.join(d, on=on, how="left")


def full_outer_coalesce(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    prefer: str = "left",
) -> DataFrame:
    """J3: full-outer merge + field-wise COALESCE — the stg-vs-ods merge
    (``src/bolome/ods/d_bolome_show.clj:42-50`` with ``or-tuple``
    trgx.clj:21).

    Columns shared by both sides (beyond the keys) are coalesced
    (prefer='left' → left value wins when both present, matching the
    staging-beats-ods semantics); one-sided columns pass through.
    """
    lcols = set(left.columns)
    rcols = set(right.columns)
    shared = [c for c in left.columns if c in rcols and c not in on]
    l = left
    r = right
    for c in shared:
        l = l.withColumnRenamed(c, f"__l_{c}")
        r = r.withColumnRenamed(c, f"__r_{c}")
    joined = l.join(r, on=list(on), how="full")
    # key columns are never NULL on a full outer join over `on=list(...)`
    # (Spark coalesces them); rebuild shared columns with or-tuple semantics
    sel = [F.col(c) for c in on]
    for c in left.columns:
        if c in on:
            continue
        if c in shared:
            a, b = f"__l_{c}", f"__r_{c}"
            if prefer != "left":
                a, b = b, a
            sel.append(or_tuple(F.col(a), F.col(b)).alias(c))
        else:
            sel.append(F.col(c))
    for c in right.columns:
        if c not in lcols and c not in on:
            sel.append(F.col(c))
    return joined.select(*sel)


def cross_spine(df: DataFrame, spine: DataFrame) -> DataFrame:
    """J4: cartesian product against a generated spine
    (``m_cocacola_score_channel.clj:53``; spine gen trgx.clj:41-43).

    The spine is tiny (months × 1) → broadcast nested-loop join; the big side
    never moves.
    """
    return df.crossJoin(F.broadcast(spine))


def semi_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """J6: EXISTS — absent in the reference, free in Spark."""
    return left.join(right, on=on, how="left_semi")


def anti_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """J6: NOT EXISTS — the reference emulated it via J3 + null checks."""
    return left.join(right, on=on, how="left_anti")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    tiebreak: str | None = None,
    allow_exact: bool = True,
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """Backward as-of join: for each left row, attach ``value_cols`` from the
    right row sharing ``on`` with the greatest ``right_ts`` <= ``left_ts``
    (< when ``allow_exact=False``). Left rows with no prior right row keep
    NULLs (left-outer semantics).

    Not in the reference (its nearest analogue is the plan-time
    latest-watermark probe, ``incremental.py``); standard in
    time-series/feature-store pipelines (pandas ``merge_asof``,
    DuckDB ``ASOF JOIN``).

    100 TB posture — this is a *composition*, not a UDF:

    - tag both sides, ``unionByName``, one window
      ``partitionBy(on) orderBy(ts, side, tiebreak)`` with
      ``last(struct, ignorenulls=True)`` over a row frame → exactly ONE
      shuffle on the join key, streaming per-key sort, no
      per-row Python, no range-duplicated probe rows (the naive
      ``l.ts >= r.ts`` theta-join explodes quadratically per key).
    - the matched columns are packed in ONE struct so they atomically come
      from the same right row (independent ``last`` per column could mix
      rows when a value column is NULL).
    - equal-timestamp ties inside the right side resolve deterministically
      by ``tiebreak`` (default: last value col) — hash-stable across runs.

    ``tolerance_seconds`` nulls out matches older than the window (pandas
    ``merge_asof(tolerance=...)``), evaluated post-match, map-side.
    """
    on = list(on)
    tiebreak = tiebreak or value_cols[-1]
    packed = F.struct(
        F.col(right_ts).alias("__ts"), *[F.col(c).alias(c) for c in value_cols]
    )
    r = right.select(
        *on,
        F.col(right_ts).alias("__ats"),
        F.col(tiebreak).alias("__tie"),
        F.lit(0 if allow_exact else 1).alias("__side"),
        packed.alias("__match"),
    )
    l = left.select(
        *left.columns,
        F.col(left_ts).alias("__ats"),
        F.lit(None).cast(r.schema["__tie"].dataType).alias("__tie"),
        F.lit(1 if allow_exact else 0).alias("__side"),
        F.lit(None).cast(r.schema["__match"].dataType).alias("__match"),
    )
    w = (
        Window.partitionBy(*on)
        .orderBy("__ats", "__side", "__tie")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        l.unionByName(r.select(*on, "__ats", "__tie", "__side", "__match"), allowMissingColumns=True)
        .withColumn("__m", F.last("__match", ignorenulls=True).over(w))
        .where(F.col("__side") == F.lit(1 if allow_exact else 0))
    )
    if tolerance_seconds is not None:
        in_window = F.col("__m.__ts") >= (
            F.col("__ats") - F.expr(f"INTERVAL {int(tolerance_seconds)} SECOND")
        )
        matched = matched.withColumn(
            "__m", F.when(in_window, F.col("__m"))
        )
    return matched.select(
        *left.columns, *[F.col(f"__m.{c}").alias(c) for c in value_cols]
    )


def range_join(
    probe: DataFrame,
    ts_col: str,
    intervals: DataFrame,
    start_col: str,
    end_col: str,
    extra_on: Sequence[str] | None = None,
    bucket_seconds: int = 3600,
    broadcast_intervals: bool = False,
) -> DataFrame:
    """Interval-overlap join: probe rows whose ``ts_col`` falls in
    ``[start_col, end_col]`` of an intervals row (plus optional equi keys).

    Not in the reference (closest shape: the train-window slicing spine
    join, ``mlvar/d_bolome_user_order_stat.clj:52-70``). Standard
    range/interval join (TimescaleDB, Flink interval join).

    100 TB posture: the naive plan is a BroadcastNestedLoopJoin evaluating
    |probe|×|intervals| predicates — fine only when intervals is tiny
    (``broadcast_intervals=True`` takes that path explicitly). The scale
    path buckets time: each interval explodes to the ``bucket_seconds``-grain
    cells it overlaps, each probe row maps to exactly ONE cell, and the join
    is a hash equi-join on (cell, *extra_on) with the BETWEEN residual
    applied post-match. Cost O(|probe| + Σ cells-per-interval) instead of
    the quadratic cross — pick ``bucket_seconds`` near the median interval
    width so the explosion factor stays ~2. Every (probe, interval) pair
    meets exactly once (the probe's cell is unique), so no dedup pass is
    needed. (Cell ids use integer ``div`` on epoch-micros: exact, no double
    rounding; pre-1970 timestamps would need floor-div.)
    """
    extra_on = list(extra_on or [])
    within = (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) <= F.col(end_col))
    if broadcast_intervals:
        cond = [F.col(ts_col) >= F.col(start_col), F.col(ts_col) <= F.col(end_col)] + [
            probe[c] == intervals[c] for c in extra_on
        ]
        from functools import reduce

        return probe.join(
            F.broadcast(intervals),
            on=reduce(lambda a, b: a & b, cond),
            how="inner",
        )
    step_us = int(bucket_seconds) * 1_000_000

    def cell(col: str) -> F.Column:
        # cast-to-timestamp accepts both TIMESTAMP and TIMESTAMP_NTZ inputs
        # (unix_micros alone rejects NTZ); the mapping only needs to be
        # monotonic and identical on both sides, so session-tz is irrelevant.
        return F.expr(f"unix_micros(cast({col} as timestamp)) div {step_us}")

    cells = intervals.withColumn(
        "__cell", F.explode(F.sequence(cell(start_col), cell(end_col)))
    )
    probed = probe.withColumn("__cell", cell(ts_col))
    return (
        probed.join(cells, on=["__cell"] + extra_on, how="inner")
        .where(within)
        .drop("__cell")
    )


def salted_join(
    big: DataFrame,
    skewed: DataFrame,
    on: str,
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Skew-buster for a hot join key: explode the small/skewed side into
    ``salt`` replicas, salt the big side randomly-but-deterministically
    (hash of a row-unique column set), join on (key, salt).

    AQE's skew-join split handles most cases; this is for the residual
    single-hot-key shape at 100 TB. Not present in the reference (it had no
    skew handling at all — SURVEY §4.1).
    """
    salted_small = skewed.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    salted_big = big.withColumn(
        "__salt",
        F.pmod(F.hash(*[F.col(c) for c in big.columns]), F.lit(salt)),
    )
    return (
        salted_big.join(salted_small, on=[on, "__salt"], how=how).drop("__salt")
    )
