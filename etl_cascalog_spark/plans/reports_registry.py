"""Registry of the reference's report jobs as declarative specs.

Each entry re-states one ``src/cocacola/rpt/`` job (SURVEY.md Appendix A)
as: a source-preparation function (the job's filters + derived columns,
cited) + a :class:`~etl_cascalog_spark.plans.report.ReportSpec`. Running
one is::

    df = build_reference_report(spark, "score_channel", score_df,
                                spine=("2017-01-01", "2017-03-31"))

The source DataFrame must follow the FIXTURES.md schema for the job's tap
(``model.d_cocacola_score`` etc.). The seven score metrics carry the
reference's exact JSON keys (m_cocacola_score_channel.clj:82).

The registry covers every DISTINCT shape in the 38-job inventory — the
remaining jobs are the same shapes pointed at sibling taps/dims (Appendix
A maps each); adding one is a data edit, not code.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_cascalog_spark.operators.filters import regex_guard, require_non_null
from etl_cascalog_spark.plans.report import ReportSpec, build_report

#: the 7 score metrics with the reference's JSON keys → period-comparison
#: columns (tr-dimension-metrics call, m_cocacola_score_channel.clj:82)
SCORE_METRICS = {
    "score": "value",
    "pp_score": "pp_value",
    "vs_pp_score": "pp_delta",
    "last_dec_score": "last_dec_value",
    "vs_last_dec_score": "last_dec_delta",
    "last_year_same_month_score": "yoy_value",
    "vs_last_year_same_month_score": "yoy_delta",
}

#: bottler exclusion regexes — the F6 guard used by every score report
#: (m_cocacola_score_overall.clj:68-70 / _channel.clj:77-79)
BOTTLER_EXCLUDES = (r"\S*区域$", r"\S*辽宁$", r"Tier\d")

TOTAL_CHANNEL = "Total / 所有渠道"


def kpi_from_item(item: Column) -> Column:
    """First '-'-segment of item; '产品铺货率' normalizes to '产品铺货'
    (m_cocacola_score_overall.clj:64-65)."""
    kpi = F.element_at(F.split(item, "-"), 1)
    return F.when(kpi == "产品铺货率", F.lit("产品铺货")).otherwise(kpi)


def _drop_bottler_rollups(df: DataFrame) -> DataFrame:
    # the F6 guard idiom: bottler → NULL on any exclusion match, then the
    # implicit ?var NOT NULL drops the row (F4)
    guarded = df.withColumn("bottler", regex_guard(F.col("bottler"), *BOTTLER_EXCLUDES))
    return require_non_null(guarded, "bottler")


def _prep_score_overall(df: DataFrame) -> DataFrame:
    """m_cocacola_score_overall.clj:60-74: code IS NULL, kpi=全体,
    channel=Total, bottler exclusions."""
    return _drop_bottler_rollups(
        df.where(F.col("code").isNull())
        .where(kpi_from_item(F.col("item")) == "全体")
        .where(F.col("channel") == TOTAL_CHANNEL)
    )


def _prep_score_channel(df: DataFrame) -> DataFrame:
    """m_cocacola_score_channel.clj:69-83: kpi=全体, channel≠Total."""
    return _drop_bottler_rollups(
        df.where(F.col("code").isNull())
        .where(kpi_from_item(F.col("item")) == "全体")
        .where(F.col("channel") != TOTAL_CHANNEL)
    )


def _prep_score_kpi(df: DataFrame) -> DataFrame:
    """m_cocacola_score_kpi.clj:58-73: channel=Total, kpi≠全体; kpi becomes
    a payload dimension."""
    out = (
        df.where(F.col("code").isNull())
        .where(F.col("channel") == TOTAL_CHANNEL)
        .withColumn("kpi", kpi_from_item(F.col("item")))
        .where(F.col("kpi") != "全体")
    )
    return _drop_bottler_rollups(out)


def _prep_sku6_bg(df: DataFrame) -> DataFrame:
    """m_cocacola_sku6_bg.clj:60-69: bottler=Total, sku_type='6 SKU'."""
    return df.where(F.col("bottler") == "Total").where(F.col("sku_type") == "6 SKU")


def _prep_sovi_brand(df: DataFrame) -> DataFrame:
    """m_cocacola_sovi_brand.clj:42-91: the synthetic Others row per group,
    then market/brand exclusions — IN THE REFERENCE'S ORDER. The
    collect-kv at :45-46 groups by every var including ?market, and the
    ``(- 100 (reduce + …))`` runs over the whole per-market brand map
    (TOTAL included, if present); only afterwards (:72,:75) does the report
    drop Tier markets and the TOTAL brand. So Others is per-market and its
    sum INCLUDES a TOTAL row's value — strict parity with the job, even
    though that double-count is arguably a reference bug (filtering first
    would give Others = 100 − Σ real brands). Here: grouped remainder
    union (map-side + one grouped pass, no pivot round-trip), filters
    last."""
    dims = ["dw_dt", "bg", "bottler", "channel", "market", "juice_type", "sovi_type"]
    others = (
        df.groupBy(*[F.col(c) for c in dims])
        .agg((F.lit(100.0) - F.sum("value")).alias("value"))
        .withColumn("brand", F.lit("Others"))
    )
    unioned = df.select(*dims, "brand", "value").unionByName(
        others.select(*dims, "brand", "value")
    )
    return (
        unioned.where(regex_guard(F.col("market"), r"Tier\d").isNotNull())
        .where(F.col("brand") != "TOTAL")
    )


@dataclass(frozen=True)
class ReferenceReport:
    """One reference job: prepare() + the declarative spec skeleton."""

    prepare: Callable[[DataFrame], DataFrame]
    selector_dims: Sequence[str]
    payload_dims: Sequence[str]
    source: str
    cite: str
    category: str = "score"


REPORTS: dict[str, ReferenceReport] = {
    "score_overall": ReferenceReport(
        _prep_score_overall, ["bg", "bottler"], [],
        "model.d_cocacola_score", "m_cocacola_score_overall.clj:60-74",
    ),
    "score_channel": ReferenceReport(
        _prep_score_channel, ["bg", "bottler"], ["channel"],
        "model.d_cocacola_score", "m_cocacola_score_channel.clj:69-83",
    ),
    "score_kpi": ReferenceReport(
        _prep_score_kpi, ["bg", "bottler"], ["kpi"],
        "model.d_cocacola_score", "m_cocacola_score_kpi.clj:58-73",
    ),
    "sku6_bg": ReferenceReport(
        _prep_sku6_bg, ["channel"], ["bg"],
        "model.d_cocacola_sku", "m_cocacola_sku6_bg.clj:60-69",
    ),
    "sovi_brand": ReferenceReport(
        _prep_sovi_brand, ["bg", "bottler", "channel"],
        ["brand", "juice_type", "sovi_type"],
        "model.d_cocacola_sovi", "m_cocacola_sovi_brand.clj:42-91",
        category="sovi",
    ),
}


def build_reference_report(
    spark: SparkSession,
    name: str,
    source_df: DataFrame,
    spine: tuple[str, str],
) -> DataFrame:
    """Run registry report ``name`` over a FIXTURES-schema source frame."""
    r = REPORTS[name]
    prepared = r.prepare(source_df).select(
        F.col("dw_dt").cast("date").alias("dw_dt"),
        *[F.col(c) for c in [*r.selector_dims, *r.payload_dims]],
        "value",
    )
    spec = ReportSpec(
        report=name,
        project="cocacola",
        category=r.category,
        source=r.source,
        date_col="dw_dt",
        value_col="value",
        selector_dims=list(r.selector_dims),
        payload_dims=list(r.payload_dims),
        spine_start=spine[0],
        spine_end=spine[1],
        metrics=SCORE_METRICS,
    )
    return build_report(spark, prepared, spec)


def build_achievement_rate(
    spark: SparkSession, source_df: DataFrame, bg_all: bool = False
) -> DataFrame:
    """m_cocacola_score_achievement_rate.clj:43-83 — the static FR shape:
    dw_dt pinned to the 9999-12-31 snapshot key, selector (bg, channel,
    kpi), payload [bottler, period] → raw (c_total_score, c_weight,
    value); the ``bg_all`` variant filters bottlers to the BG set and
    rebadges the bg selector (the reference ran it as a second query
    unioned into the sink — O3)."""
    from etl_cascalog_spark.plans.report import StaticReportSpec, build_static_report

    df = source_df
    if bg_all:
        df = df.where(F.col("bottler").isin(["SBL", "CBL", "BIG", "Zhuhai"]))
        df = df.withColumn("bg", F.lit("0.2_BGs"))
    spec = StaticReportSpec(
        report="achievement_rate",
        project="cocacola",
        category="score",
        source="model.d_cocacola_achievement_rate",
        selector_dims=["bg", "channel", "kpi"],
        payload_dims=["bottler", "period"],
        metrics=["c_total_score", "c_weight", "value"],
    )
    return build_static_report(spark, df, spec)
