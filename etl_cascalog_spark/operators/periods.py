"""Period-over-period comparison engine (SURVEY.md §2.6, W1-W5).

The reference's signature computation: instead of window functions it

1. pivots every period of a series into a per-group map
   (``collect-kv`` — m_cocacola_score_channel.clj:42-45);
2. cross-joins a month-end date spine (``mk-month-dts`` trgx.clj:41-43,
   applied at m_cocacola_score_channel.clj:53);
3. computes calendar lag keys — prev month-end / last Dec 31 / same month
   last year (trgx.clj:30-32);
4. probes the map with all keys at once (``kv->lkp`` trgx.clj:60);
5. emits null-propagating deltas (m_cocacola_score_channel.clj:58-60).

Semantics to preserve: lags are **calendar-keyed, not row-offset** — a
missing month yields NULL, never the previous row's value.

Engine implementation keeps the same one-shuffle shape: ``groupBy(dims)``
pivot → broadcast cross-join with the spine → map probes (JVM ``element_at``)
→ delta columns. At 100 TB the single shuffle is on the grouping dims; the
spine join is broadcast; everything after is map-side codegen.

An equivalent-but-windowed formulation (lag over a densified spine) would
cost the same shuffle plus a sort; the map-probe keeps the group's history in
one aggregation buffer instead. For very long histories per group (> ~10^4
periods) prefer the window formulation; report data is months (≤ hundreds).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_cascalog_spark.functions.dates import (
    month_spine,
    prev_last_day,
    prev_last_month,
    prev_same_month,
)
from etl_cascalog_spark.functions.conditionals import null_safe_delta
from etl_cascalog_spark.operators.aggregates import grouped_pivot
from etl_cascalog_spark.operators.joins import cross_spine


def with_period_comparisons(
    spark: SparkSession,
    df: DataFrame,
    dims: Sequence[str],
    date_col: str,
    value_col: str,
    spine_start: str,
    spine_end: str,
    keep_missing: bool = False,
) -> DataFrame:
    """The full W1/W2 pipeline. Output: one row per (dims × spine month) with

    - ``dw_dt``          the spine month-end
    - ``value``          value at that month (NULL if missing)
    - ``pp_value``       previous month-end value       (W1, calendar LAG 1)
    - ``last_dec_value`` value at last Dec 31           (W2, year anchor)
    - ``yoy_value``      same month-end last year value (W2, calendar LAG 12)
    - ``pp_delta`` / ``last_dec_delta`` / ``yoy_delta`` null-safe deltas

    ``keep_missing=False`` drops spine months where the group has no value —
    matching the reference, whose report rule binds ``?value`` (a ``?var`` ⇒
    implicit NOT NULL, SURVEY F4) after the map probe.
    """
    pivoted = grouped_pivot(
        df, dims, F.col(date_col), F.col(value_col), out_col="__kv"
    )
    spine = month_spine(spark, spine_start, spine_end)
    expanded = cross_spine(pivoted, spine)

    dt = F.col("spine_dt")
    kv = F.col("__kv")
    out = (
        expanded.select(
            *[F.col(d) for d in dims],
            dt.alias("dw_dt"),
            F.element_at(kv, dt).alias("value"),
            F.element_at(kv, prev_last_day(dt)).alias("pp_value"),
            F.element_at(kv, prev_last_month(dt)).alias("last_dec_value"),
            F.element_at(kv, prev_same_month(dt)).alias("yoy_value"),
        )
    )
    if not keep_missing:
        out = out.where(F.col("value").isNotNull())
    return out.select(
        "*",
        null_safe_delta(F.col("value"), F.col("pp_value")).alias("pp_delta"),
        null_safe_delta(F.col("value"), F.col("last_dec_value")).alias("last_dec_delta"),
        null_safe_delta(F.col("value"), F.col("yoy_value")).alias("yoy_delta"),
    )


def cascade_rollup(
    df: DataFrame,
    ts_col: str,
    measures: dict[str, tuple[F.Column, "Callable[[str], F.Column]"]],
    grains: Sequence[str] = ("hour", "day", "month"),
    materialize: bool = True,
) -> DataFrame:
    """Hypertable-style continuous-aggregate cascade (beyond-reference;
    TimescaleDB continuous aggregates / Druid rollup shape): materialize the
    finest time grain from the raw table ONCE, then derive every coarser
    grain by re-aggregating the previous level's partials.

    ``measures`` maps output name → (leaf aggregate over raw rows, merge
    aggregate over a partial column). Measures must be decomposable
    (count→sum, sum→sum, min→min, max→max); AVG callers carry (sum, count)
    and divide at the end.

    100 TB posture: the raw table is scanned and shuffled exactly once (the
    finest grain, ~10^4× smaller than raw at hourly grain on event data);
    each coarser level re-aggregates the previous level — KB-MB sized — so
    day/month/year levels are effectively free. The naive alternative
    (one groupBy per grain over raw) scans and shuffles the 100 TB input
    |grains| times. ``grains`` must be ordered finest→coarsest; every level
    stays exact because the merge runs over unrounded partials.

    ``materialize=True`` persists the finest level before deriving: Spark
    does NOT share a common subtree across union branches (measured: 3 raw
    FileScans without it), so the persist is what makes the "scan raw once"
    claim physically true — it IS the continuous-aggregate materialization
    step, and it is leaf-sized (post-rollup), not raw-sized.
    """
    levels: list[DataFrame] = []
    leaf = df.groupBy(
        F.date_trunc(grains[0], F.col(ts_col)).alias("__bucket")
    ).agg(*[expr.alias(name) for name, (expr, _merge) in measures.items()])
    if materialize:
        from pyspark import StorageLevel

        leaf = leaf.persist(StorageLevel.MEMORY_AND_DISK)
    levels.append(leaf.withColumn("grain", F.lit(grains[0])))
    prev = leaf
    for g in grains[1:]:
        nxt = prev.groupBy(
            F.date_trunc(g, F.col("__bucket")).alias("__bucket")
        ).agg(*[merge(name).alias(name) for name, (_e, merge) in measures.items()])
        levels.append(nxt.withColumn("grain", F.lit(g)))
        prev = nxt
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out.select(
        "grain",
        F.date_format("__bucket", "yyyy-MM-dd HH:mm:ss").alias("bucket"),
        *measures.keys(),
    )
