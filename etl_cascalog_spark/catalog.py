"""Query catalog: every operator from SURVEY.md §2 as a named, oracle-checked
query over the driver's test tables (TESTDATA.md).

Each entry couples

- a Spark builder ``(spark, sf_dir) -> DataFrame`` built from the engine's
  operator library, and
- an equivalent ANSI-SQL oracle for DuckDB (``None`` for genuinely
  non-SQL-expressible ops → driver runs a rows-only check).

Determinism rules (the driver hash-compares values):

- money aggregates go through exact DECIMAL arithmetic, then
  ``round(…, 2)::double`` — bit-identical across engines;
- no raw timestamps in outputs (dates/strings instead);
- map/array intermediates are sorted before use; outputs are scalars.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_cascalog_spark.io import read_table
from etl_cascalog_spark.functions.conditionals import (
    null_safe_delta,
    nvl2,
)
from etl_cascalog_spark.operators.aggregates import grouped_pivot
from etl_cascalog_spark.operators.joins import (
    full_outer_coalesce,
    left_lookup,
    star_join,
)
from etl_cascalog_spark.operators.periods import with_period_comparisons
from etl_cascalog_spark.operators.surrogate import assign_dense_ids


@dataclass(frozen=True)
class QuerySpec:
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""


QUERIES: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    def deco(fn):
        QUERIES[name] = QuerySpec(build=fn, oracle=oracle, doc=doc)
        return fn

    return deco


def money(col: F.Column, scale: str = "decimal(12,2)") -> F.Column:
    """Exact-decimal view of a 2-dp double column (determinism rule)."""
    return col.cast(scale)


def dround(col: F.Column, digits: int = 2) -> F.Column:
    """round→double: canonical output form for aggregated money."""
    return F.round(col, digits).cast("double")


# ---------------------------------------------------------------------------
# A. Aggregation core (A1/A9, F-section pushdown) — flagship
# ---------------------------------------------------------------------------

@register(
    "pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(round(sum(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_qty,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_base_price,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS sum_disc_price,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * (1 + CAST(l_tax AS DECIMAL(4,2)))), 2) AS DOUBLE) AS sum_charge,
           CAST(round(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*), 2) AS DOUBLE) AS avg_qty,
           CAST(round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / count(*), 2) AS DOUBLE) AS avg_price,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="A1/A9 multi-agg single group; filter pushdown to scan. TPC-H Q1 shape "
    "— the reference's grouped multi-aggregator pass (trgx.clj:152-159).",
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    qty = money(F.col("l_quantity"))
    price = money(F.col("l_extendedprice"))
    disc = money(F.col("l_discount"), "decimal(4,2)")
    tax = money(F.col("l_tax"), "decimal(4,2)")
    return (
        li.where(F.col("l_shipdate") <= F.lit("2000-12-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dround(F.sum(qty)).alias("sum_qty"),
            dround(F.sum(price)).alias("sum_base_price"),
            dround(F.sum(price * (F.lit(1) - disc))).alias("sum_disc_price"),
            dround(F.sum(price * (F.lit(1) - disc) * (F.lit(1) + tax))).alias("sum_charge"),
            dround(F.sum(qty).cast("double") / F.count("*")).alias("avg_qty"),
            dround(F.sum(price).cast("double") / F.count("*")).alias("avg_price"),
            F.count("*").alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# B. Joins (J1-J4)
# ---------------------------------------------------------------------------

@register(
    "star_join_revenue",
    oracle="""
    SELECT r.r_name AS region_name, n.n_name AS nation_name,
           CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l.l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS revenue,
           count(*) AS n_items
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY 1, 2
    """,
    doc="J1 N-way star join (mlin/d_bolome_user_order.clj:73-86 shape): fact "
    "⋈ 4 dims, small dims broadcast so the fact never re-shuffles.",
)
def star_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    cust = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region")
    joined = star_join(
        li.join(orders, li.l_orderkey == orders.o_orderkey, "inner"),
        [
            (cust.select("c_custkey", "c_nationkey"), [F.col("o_custkey") == F.col("c_custkey")], "inner"),
            (nation.select("n_nationkey", "n_name", "n_regionkey"), [F.col("c_nationkey") == F.col("n_nationkey")], "inner"),
            (region, [F.col("n_regionkey") == F.col("r_regionkey")], "inner"),
        ],
    )
    price = money(F.col("l_extendedprice"))
    disc = money(F.col("l_discount"), "decimal(4,2)")
    return (
        joined.groupBy(F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name"))
        .agg(
            dround(F.sum(price * (F.lit(1) - disc))).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@register(
    "left_lookup_coalesce",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, l.l_partkey,
           coalesce(p.p_brand, 'UNKNOWN') AS brand,
           CASE WHEN p.p_partkey IS NOT NULL THEN 1 ELSE 0 END AS matched
    FROM lineitem l
    LEFT JOIN (SELECT p_partkey, p_brand FROM part WHERE p_size < 25) p
      ON l.l_partkey = p.p_partkey
    """,
    doc="J2 left-outer dim lookup that may miss (!!var binding, mlin:81) + "
    "X6 nvl2/coalesce on the miss. Dim is broadcast.",
)
def left_lookup_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part").where(F.col("p_size") < 25).select("p_partkey", "p_brand")
    out = left_lookup(li, part, on=[F.col("l_partkey") == F.col("p_partkey")])
    return out.select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        F.coalesce(F.col("p_brand"), F.lit("UNKNOWN")).alias("brand"),
        nvl2(F.col("p_partkey"), F.lit(1), F.lit(0)).alias("matched"),
    )


@register(
    "full_outer_merge",
    oracle="""
    WITH stg AS (
      SELECT c_custkey, c_name, c_acctbal + 100.0 AS c_acctbal
      FROM customer WHERE c_custkey % 3 = 0
    ), ods AS (
      SELECT c_custkey, c_name, c_acctbal FROM customer WHERE c_custkey % 2 = 0
    )
    SELECT coalesce(s.c_custkey, o.c_custkey) AS c_custkey,
           coalesce(s.c_name, o.c_name) AS c_name,
           coalesce(s.c_acctbal, o.c_acctbal) AS c_acctbal,
           CASE WHEN s.c_custkey IS NOT NULL AND o.c_custkey IS NOT NULL THEN 'both'
                WHEN s.c_custkey IS NOT NULL THEN 'stg_only' ELSE 'ods_only' END AS src
    FROM stg s FULL OUTER JOIN ods o ON s.c_custkey = o.c_custkey
    """,
    doc="J3/I4: the stg-vs-ods full-outer merge with or-tuple coalescing "
    "(ods/d_bolome_show.clj:42-50, trgx.clj:21). Staging value wins.",
)
def full_outer_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, sf_dir, "customer")
    stg = (
        cust.where(F.col("c_custkey") % 3 == 0)
        .select("c_custkey", "c_name", (F.col("c_acctbal") + 100.0).alias("c_acctbal"))
        .withColumn("__stg", F.lit(1))
    )
    ods = (
        cust.where(F.col("c_custkey") % 2 == 0)
        .select("c_custkey", "c_name", "c_acctbal")
        .withColumn("__ods", F.lit(1))
    )
    merged = full_outer_coalesce(stg, ods, on=["c_custkey"], prefer="left")
    return merged.select(
        "c_custkey",
        "c_name",
        "c_acctbal",
        F.when(F.col("__stg").isNotNull() & F.col("__ods").isNotNull(), F.lit("both"))
        .when(F.col("__stg").isNotNull(), F.lit("stg_only"))
        .otherwise(F.lit("ods_only"))
        .alias("src"),
    )


# ---------------------------------------------------------------------------
# C. Period comparisons (W1/W2/W5, J4, A4, X6) — the signature pipeline
# ---------------------------------------------------------------------------

@register(
    "period_compare",
    oracle="""
    WITH base AS (
      SELECT o_orderpriority AS priority,
             last_day(CAST(o_orderdate AS DATE)) AS dw_dt,
             CAST(round(sum(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS value
      FROM orders GROUP BY 1, 2
    ), spine AS (
      SELECT last_day(CAST(d AS DATE)) AS dw_dt
      FROM (SELECT unnest(generate_series(DATE '1996-01-01', DATE '1997-12-01', INTERVAL 1 MONTH)) AS d)
    ), dims AS (SELECT DISTINCT priority FROM base)
    SELECT d.priority, s.dw_dt,
           b.value AS value,
           pp.value AS pp_value,
           dec.value AS last_dec_value,
           yoy.value AS yoy_value,
           b.value - pp.value AS pp_delta,
           b.value - dec.value AS last_dec_delta,
           b.value - yoy.value AS yoy_delta
    FROM dims d
    CROSS JOIN spine s
    LEFT JOIN base b   ON b.priority = d.priority AND b.dw_dt = s.dw_dt
    LEFT JOIN base pp  ON pp.priority = d.priority AND pp.dw_dt = last_day(s.dw_dt - INTERVAL 1 MONTH)
    LEFT JOIN base dec ON dec.priority = d.priority AND dec.dw_dt = make_date(CAST(year(s.dw_dt) AS INT) - 1, 12, 31)
    LEFT JOIN base yoy ON yoy.priority = d.priority AND yoy.dw_dt = last_day(s.dw_dt - INTERVAL 12 MONTH)
    WHERE b.value IS NOT NULL
    """,
    doc="§2.6 signature sliding: group-pivot (A4) → month spine (W5/J4) → "
    "calendar lag keys prev-last-day/prev-last-month/prev-same-month "
    "(trgx.clj:30-32) → map probe (kv->lkp trgx.clj:60) → null-safe deltas "
    "(m_cocacola_score_channel.clj:58-60). Calendar-keyed: missing month → "
    "NULL, never the previous row.",
)
def period_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    monthly = (
        orders.groupBy(
            F.col("o_orderpriority").alias("priority"),
            F.last_day(F.col("o_orderdate").cast("date")).alias("dw_dt"),
        )
        .agg(dround(F.sum(money(F.col("o_totalprice")))).alias("value"))
    )
    return with_period_comparisons(
        spark,
        monthly,
        dims=["priority"],
        date_col="dw_dt",
        value_col="value",
        spine_start="1996-01-01",
        spine_end="1997-12-31",
    )


@register(
    "pivot_kv_lookup",
    oracle="""
    WITH b AS (
      SELECT user_id, event_type,
             CAST(round(sum(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE) AS v
      FROM events GROUP BY 1, 2
    )
    SELECT user_id,
           max(CASE WHEN event_type = 'purchase' THEN v END) AS purchase_total,
           max(CASE WHEN event_type = 'view' THEN v END) AS view_total,
           max(CASE WHEN event_type = 'click' THEN v END) AS click_total
    FROM b GROUP BY user_id
    """,
    doc="A4/X7: collect-kv map pivot (trgx.clj:45) + multi-key probe "
    "kv->lkp (trgx.clj:60) — scalars out, one shuffle per level.",
)
def pivot_kv_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_table(spark, sf_dir, "events")
    per_type = events.groupBy("user_id", "event_type").agg(
        dround(F.sum(money(F.col("value")))).alias("v")
    )
    pivoted = grouped_pivot(per_type, ["user_id"], F.col("event_type"), F.col("v"), out_col="kv")
    kv = F.col("kv")
    return pivoted.select(
        "user_id",
        F.element_at(kv, "purchase").alias("purchase_total"),
        F.element_at(kv, "view").alias("view_total"),
        F.element_at(kv, "click").alias("click_total"),
    )


# ---------------------------------------------------------------------------
# D. Windows / ranking / surrogate ids (W3/W4, A8)
# ---------------------------------------------------------------------------

@register(
    "surrogate_ids",
    oracle="""
    SELECT c_custkey,
           999 + row_number() OVER (ORDER BY c_custkey) AS dw_id
    FROM customer
    """,
    doc="A8/E2 surrogate-id continuation from max existing id "
    "(trgx.clj:166-186) — parallel window row_number, not the reference's "
    "single-reducer group (ods/d_bolome_show.clj:51).",
)
def surrogate_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, sf_dir, "customer").select("c_custkey")
    return assign_dense_ids(cust, order_by=["c_custkey"], id_col="dw_id", start_at=1000)


@register(
    "top_n_per_group",
    oracle="""
    SELECT * FROM (
      SELECT c_nationkey, c_custkey, c_acctbal,
             row_number() OVER (PARTITION BY c_nationkey
                                ORDER BY c_acctbal DESC, c_custkey) AS rn
      FROM customer
    ) WHERE rn <= 3
    """,
    doc="W4 ranking / O1 first-n: top-k per group via row_number window "
    "(the reference shipped sort keys to the UI instead — "
    "m_cocacola_score_top_bottom5_ranking.clj:97).",
)
def top_n_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return (
        cust.select("c_nationkey", "c_custkey", "c_acctbal")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
    )
