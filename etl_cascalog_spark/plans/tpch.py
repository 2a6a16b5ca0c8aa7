"""Adapted TPC-H decision-support suite (Q3-Q22) over the driver's trimmed
TPC-H-ish tables.

The reference engine's report jobs are hand-rolled star joins, grouped
aggregates, correlated existence probes and top-n cuts — exactly the shapes
the public TPC-H spec standardises.  This module re-states those shapes as
the classic suite so the engine's join/agg/subquery surface is exercised by
an externally-recognisable benchmark, each query oracle-checked against
DuckDB running the same SQL.

Adaptations (the driver's tables are trimmed vs the spec — TESTDATA.md):

- no ``partsupp`` table -> Q16/Q20 use ``lineitem`` as the part-supplier
  relation (which supplier actually shipped which part), and Q2/Q11 run
  over a DERIVED partsupp (distinct shipped pairs + deterministic
  hash-derived DECIMAL supply cost — see the Q2/Q11 banner below);
- ``lineitem`` has no commit/receipt dates or shipmode -> Q4/Q12/Q21 measure
  lateness as ``l_shipdate`` vs ``o_orderdate + N days``;
- no comment/phone/address/container/mfgr columns -> exclusion predicates
  use ``o_orderpriority`` (Q13), ``s_acctbal`` (Q16), ``p_size`` (Q17/Q19)
  and ``c_nationkey`` (Q22) instead;
- Q1 is already in the catalog as ``pricing_summary``.

Determinism contract (catalog.py module docstring): money math in exact
DECIMAL, division at the edge as ``round(double, n)``, dates emitted as
``yyyy-MM-dd`` strings, ordered cuts carry total tie-breaks.  Correlated
``x < frac * avg(y)`` predicates are restated as integer-exact
cross-multiplications (``k * x * cnt < sum``) so no engine ever compares a
rounded average.

Scale notes are per-query; the common discipline: BOUNDED dimension
sides (region/nation — fixed row counts — and 1-row scalar aggregates)
carry mandatory broadcast hints; customer/supplier/part SCALE with the
data, so their attaches are bare equi-joins and the planner (stats at
plan time, AQE at runtime) broadcasts them only while they actually fit
under autoBroadcastJoinThreshold — at benchmark SFs that reproduces the
classic broadcast plans, at 100 TB it degrades safely to shuffle joins
instead of OOMing the driver. Fact tables shuffle only on their own
join/group keys, existence probes are semi/anti joins (never
``collect``), and top-n is TakeOrderedAndProject — no global sort
materialisation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_cascalog_spark.catalog import dround, money, register
from etl_cascalog_spark.io import read_table


def _rev() -> F.Column:
    """Exact-decimal extended revenue: price * (1 - discount)."""
    return money(F.col("l_extendedprice")) * (
        F.lit(1) - money(F.col("l_discount"), "decimal(4,2)")
    )


_REV_SQL = "CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))"


@register(
    "tpch_q3",
    oracle=f"""
    SELECT l.l_orderkey,
           CAST(round(sum({_REV_SQL}), 2) AS DOUBLE) AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS order_date
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l.l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3 shipping priority (no o_shippriority column in the trimmed "
    "schema). Plan: BUILDING customers attach via a bare join (AQE "
    "broadcasts while they fit), lineitem "
    "joins on its own l_orderkey, top-10 via TakeOrderedAndProject — at "
    "100 TB only the orderkey groupBy shuffles the fact.",
)
def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp")
    orders = read_table(spark, sf_dir, "orders").where(F.col("o_orderdate") < cutoff)
    li = read_table(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > cutoff)
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dround(F.sum(_rev())).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@register(
    "tpch_q4",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-10-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
      )
    GROUP BY o_orderpriority
    """,
    doc="TPC-H Q4 order-priority checking; lateness = shipped >30 days after "
    "order (no l_commitdate/l_receiptdate in the trimmed schema). The "
    "EXISTS is a left-semi join on l_orderkey with the date predicate in "
    "the join condition — one key shuffle, no distinct, no count probe.",
)
def tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-07-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01 00:00:00").cast("timestamp"))
    )
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


@register(
    "tpch_q5",
    oracle=f"""
    SELECT n.n_name AS nation,
           CAST(round(sum({_REV_SQL}), 2) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n.n_name
    """,
    doc="TPC-H Q5 local-supplier volume: the customer-nation = supplier-"
    "nation equality rides on the supplier join (planner-chosen "
    "broadcast at bench SF), so the only "
    "exchanges are lineitem->l_orderkey and the final nation groupBy.",
)
def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = read_table(spark, sf_dir, "lineitem")
    supp = read_table(spark, sf_dir, "supplier")
    nat = read_table(spark, sf_dir, "nation")
    reg = read_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            supp,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(dround(F.sum(_rev())).alias("revenue"))
    )


@register(
    "tpch_q6",
    oracle="""
    SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                          * CAST(l_discount AS DECIMAL(4,2))), 2) AS DOUBLE) AS revenue,
           count(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND CAST(l_discount AS DECIMAL(4,2)) BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6 forecast-revenue change: pure scan-side predicate work — "
    "every filter reaches the parquet scan (date min/max + stats pruning), "
    "the discount band compares in exact DECIMAL, and the whole query is "
    "one map-side partial agg + a single-row exchange.",
)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    disc = money(F.col("l_discount"), "decimal(4,2)")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
            & (disc >= F.lit("0.05").cast("decimal(4,2)"))
            & (disc <= F.lit("0.07").cast("decimal(4,2)"))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dround(F.sum(money(F.col("l_extendedprice")) * disc)).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "tpch_q7",
    oracle=f"""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS INT) AS l_year,
           CAST(round(sum({_REV_SQL.replace('l_extendedprice', 'l.l_extendedprice').replace('l_discount', 'l.l_discount')}), 2) AS DOUBLE) AS revenue
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
    JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
    WHERE ((sn.n_name = 'NATION_12' AND cn.n_name = 'NATION_11')
        OR (sn.n_name = 'NATION_11' AND cn.n_name = 'NATION_12'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY 1, 2, 3
    """,
    doc="TPC-H Q7 volume shipping between a nation pair, both directions. "
    "Both nation lookups broadcast; the disjunctive pair predicate is "
    "evaluated post-broadcast in codegen, so the fact still shuffles only "
    "on l_orderkey + the final 3-key groupBy.",
)
def tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    supp = read_table(spark, sf_dir, "supplier")
    nat = read_table(spark, sf_dir, "nation")
    sn = nat.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = nat.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_12") & (F.col("cust_nation") == "NATION_11")
    ) | ((F.col("supp_nation") == "NATION_11") & (F.col("cust_nation") == "NATION_12"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .where(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(dround(F.sum(_rev())).alias("revenue"))
    )


@register(
    "tpch_q8",
    oracle=f"""
    WITH all_nations AS (
      SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
             {_REV_SQL.replace('l_extendedprice', 'l.l_extendedprice').replace('l_discount', 'l.l_discount')} AS volume,
             sn.n_name AS supp_nation
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
      JOIN region r   ON cn.n_regionkey = r.r_regionkey
      JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
      WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    )
    SELECT o_year,
           CAST(round(CAST(sum(CASE WHEN supp_nation = 'NATION_2' THEN volume ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
                      / CAST(sum(volume) AS DOUBLE), 6) AS DOUBLE) AS mkt_share
    FROM all_nations
    GROUP BY o_year
    """,
    doc="TPC-H Q8 national market share: NATION_2's share of ECONOMY-part "
    "revenue sold into ASIA-region customers, per year. Numerator and "
    "denominator both accumulate in exact DECIMAL; the single division "
    "happens once per output row at the edge (round 6). All seven "
    "non-fact relations attach planner-chosen (nation/region hinted).",
)
def tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = read_table(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    li = read_table(spark, sf_dir, "lineitem")
    supp = read_table(spark, sf_dir, "supplier")
    orders = read_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    cust = read_table(spark, sf_dir, "customer")
    nat = read_table(spark, sf_dir, "nation")
    reg = read_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    cn = nat.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    sn = nat.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    vol = _rev()
    zero = F.lit(0).cast("decimal(12,2)")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(reg), F.col("cn_region") == F.col("r_regionkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_2", vol).otherwise(zero)
                ).cast("double")
                / F.sum(vol).cast("double"),
                6,
            )
            .cast("double")
            .alias("mkt_share")
        )
    )


@register(
    "tpch_q9",
    oracle="""
    SELECT sn.n_name AS nation, CAST(year(o.o_orderdate) AS INT) AS o_year,
           CAST(round(sum(
             CAST(l.l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l.l_discount AS DECIMAL(4,2)))
             - CAST(p.p_retailprice AS DECIMAL(12,2)) * CAST(l.l_quantity AS DECIMAL(12,2)) * CAST(0.5 AS DECIMAL(2,1))
           ), 2) AS DOUBLE) AS sum_profit
    FROM part p
    JOIN lineitem l ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
    WHERE p.p_name LIKE '%bolt%'
    GROUP BY 1, 2
    """,
    doc="TPC-H Q9 product-type profit. No partsupp/ps_supplycost in the "
    "trimmed schema, so cost is modelled as half the part's retail price "
    "per unit — the profit expression stays exact DECIMAL end-to-end "
    "(12,2 x 12,2 x 2,1 products, one rounded cast at the edge).",
)
def tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = read_table(spark, sf_dir, "part").where(F.col("p_name").like("%bolt%"))
    li = read_table(spark, sf_dir, "lineitem")
    supp = read_table(spark, sf_dir, "supplier")
    orders = read_table(spark, sf_dir, "orders")
    nat = read_table(spark, sf_dir, "nation")
    profit = _rev() - (
        money(F.col("p_retailprice"))
        * money(F.col("l_quantity"))
        * F.lit("0.5").cast("decimal(2,1)")
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(dround(F.sum(profit)).alias("sum_profit"))
    )


@register(
    "tpch_q10",
    oracle=f"""
    SELECT c.c_custkey, c.c_name,
           CAST(round(sum({_REV_SQL.replace('l_extendedprice', 'l.l_extendedprice').replace('l_discount', 'l.l_discount')}), 2) AS DOUBLE) AS revenue,
           c.c_acctbal, n.n_name AS nation
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10 returned-item reporting (address/phone/comment columns "
    "absent). Returnflag + quarter filters reach both scans; the top-20 "
    "is TakeOrderedAndProject over the grouped frame.",
)
def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    li = read_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    nat = read_table(spark, sf_dir, "nation")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", F.col("n_name").alias("nation"))
        .agg(dround(F.sum(_rev())).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@register(
    "tpch_q12",
    oracle="""
    SELECT CASE WHEN date_diff('day', o.o_orderdate, l.l_shipdate) <= 30 THEN '0-30'
                WHEN date_diff('day', o.o_orderdate, l.l_shipdate) <= 90 THEN '31-90'
                ELSE '90+' END AS delay_bucket,
           sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS high_line_count,
           sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS low_line_count
    FROM orders o
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY 1
    """,
    doc="TPC-H Q12 shipping-mode priority, restated over ship-delay buckets "
    "(no l_shipmode/commit/receipt columns): order->ship latency classed "
    "0-30/31-90/90+ days, urgent-vs-other line counts per class. One "
    "orderkey join, one 3-row groupBy.",
)
def tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    bucket = (
        F.when(delay <= 30, "0-30").when(delay <= 90, "31-90").otherwise("90+")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    one, zero = F.lit(1), F.lit(0)
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(bucket.alias("delay_bucket"))
        .agg(
            F.sum(F.when(high, one).otherwise(zero)).alias("high_line_count"),
            F.sum(F.when(~high, one).otherwise(zero)).alias("low_line_count"),
        )
    )


@register(
    "tpch_q13",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                        AND o.o_orderpriority <> '4-NOT SPECIFIED'
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    doc="TPC-H Q13 customer order-count distribution; the spec's comment "
    "NOT LIKE exclusion becomes an o_orderpriority exclusion, kept in the "
    "JOIN condition (not a WHERE) so customers with only excluded orders "
    "still count as c_count=0. Two-level agg: orders shuffles once on "
    "o_custkey, the second groupBy is over ~50 distinct counts.",
)
def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, sf_dir, "customer").select("c_custkey")
    orders = read_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "4-NOT SPECIFIED"
    )
    per_cust = (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@register(
    "tpch_q14",
    oracle=f"""
    SELECT CAST(round(100.0 * CAST(sum(CASE WHEN p.p_type = 'PROMO'
                 THEN {_REV_SQL.replace('l_extendedprice', 'l.l_extendedprice').replace('l_discount', 'l.l_discount')}
                 ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
               / CAST(sum({_REV_SQL.replace('l_extendedprice', 'l.l_extendedprice').replace('l_discount', 'l.l_discount')}) AS DOUBLE), 6) AS DOUBLE) AS promo_revenue
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'
    """,
    doc="TPC-H Q14 promotion effect: PROMO-type revenue share for one "
    "month. Part attaches planner-chosen, month filter on the scan, exact-DECIMAL "
    "numerator/denominator, one division at the edge.",
)
def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-09-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01 00:00:00").cast("timestamp"))
    )
    part = read_table(spark, sf_dir, "part")
    zero = F.lit(0).cast("decimal(12,2)")
    promo = F.when(F.col("p_type") == "PROMO", _rev()).otherwise(zero)
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                F.lit(100.0) * F.sum(promo).cast("double") / F.sum(_rev()).cast("double"),
                6,
            )
            .cast("double")
            .alias("promo_revenue")
        )
    )


@register(
    "tpch_q15",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no, sum({_REV_SQL}) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name,
           CAST(round(r.total_rev, 2) AS DOUBLE) AS total_revenue
    FROM supplier s
    JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_rev = (SELECT max(total_rev) FROM revenue)
    """,
    doc="TPC-H Q15 top supplier: quarterly revenue per supplier, keep the "
    "max. The max is compared on the exact DECIMAL sum (never the rounded "
    "double), via a single-row broadcast join — the view is computed once "
    "and reused for both sides, no re-scan.",
)
def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_rev()).alias("total_rev")
    )
    best = rev.agg(F.max("total_rev").alias("best_rev"))
    supp = read_table(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(best), F.col("total_rev") == F.col("best_rev"))
        .join(supp, F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.round("total_rev", 2).cast("double").alias("total_revenue"),
        )
    )


@register(
    "tpch_q16",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_type NOT LIKE 'PROMO%'
      AND p.p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
      AND l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 500
      )
    GROUP BY 1, 2, 3
    """,
    doc="TPC-H Q16 parts/supplier relationship counting, with lineitem "
    "standing in for partsupp (which supplier actually shipped the part) "
    "and a low-acctbal supplier exclusion standing in for the complaints "
    "comment scan. The NOT IN is a broadcast anti-join (100-row build "
    "side); distinct suppliers counted per (brand, type, size).",
)
def tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = read_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1")
        & (~F.col("p_type").like("PROMO%"))
        & (F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29))
    )
    bad_supp = (
        read_table(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 500)
        .select("s_suppkey")
    )
    li = read_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(bad_supp, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "tpch_q17",
    oracle="""
    WITH per_part AS (
      SELECT l_partkey,
             sum(CAST(l_quantity AS DECIMAL(12,2))) AS sum_qty,
             count(*) AS cnt
      FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0, 2) AS DOUBLE) AS avg_yearly,
           count(*) AS n_lines
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN per_part a ON a.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#13' AND p.p_size < 10
      AND 5 * CAST(l.l_quantity AS DECIMAL(12,2)) * a.cnt < a.sum_qty
    """,
    doc="TPC-H Q17 small-quantity-order revenue (p_container absent -> "
    "p_size < 10). The correlated `qty < 0.2 * avg(qty)` is restated as "
    "the integer-exact cross-multiplication 5*qty*cnt < sum_qty so no "
    "engine compares a rounded average; per-part aggregates join back on "
    "l_partkey (at 100 TB: one partial-agg pass + one key-local join, "
    "never a window over the fact).",
)
def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part").where(
        (F.col("p_brand") == "Brand#13") & (F.col("p_size") < 10)
    )
    per_part = li.groupBy(F.col("l_partkey").alias("pp_key")).agg(
        F.sum(money(F.col("l_quantity"))).alias("sum_qty"),
        F.count("*").alias("cnt"),
    )
    cond = (
        F.lit(5) * money(F.col("l_quantity")) * F.col("cnt") < F.col("sum_qty")
    )
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(per_part, F.col("l_partkey") == F.col("pp_key"))
        .where(cond)
        .agg(
            F.round(F.sum(money(F.col("l_extendedprice"))).cast("double") / F.lit(7.0), 2)
            .cast("double")
            .alias("avg_yearly"),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "tpch_q18",
    oracle="""
    WITH big AS (
      SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(12,2))) AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING sum(CAST(l_quantity AS DECIMAL(12,2))) > 250
    )
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS order_date,
           o.o_totalprice,
           CAST(b.sum_qty AS DOUBLE) AS sum_qty
    FROM big b
    JOIN orders o   ON o.o_orderkey = b.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 100
    """,
    doc="TPC-H Q18 large-volume customers: orders whose total quantity "
    "exceeds 250 (threshold scaled to the trimmed data's ~4 lines/order). "
    "The HAVING prunes to a tiny frame BEFORE joining orders/customer, so "
    "both joins keep the filtered side small enough to broadcast "
    "(planner-chosen) at any scale.",
)
def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(money(F.col("l_quantity"))).alias("sum_qty_dec"))
        .where(F.col("sum_qty_dec") > 250)
    )
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    return (
        orders.join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            "o_totalprice",
            F.col("sum_qty_dec").cast("double").alias("sum_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


@register(
    "tpch_q19",
    oracle=f"""
    SELECT CAST(round(sum({_REV_SQL.replace('l_extendedprice', 'l.l_extendedprice').replace('l_discount', 'l.l_discount')}), 2) AS DOUBLE) AS revenue,
           count(*) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#13' AND p.p_size BETWEEN 1 AND 5  AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#25' AND p.p_size BETWEEN 1 AND 10 AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#9'  AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 20 AND 30)
    """,
    doc="TPC-H Q19 discounted revenue, disjunctive brand/size/quantity "
    "predicate (p_container absent -> p_size bands). Part attaches "
    "planner-chosen and "
    "the whole OR-of-ANDs evaluates in one codegen stage post-join; only "
    "the single-row agg exchanges.",
)
def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    qty = F.col("l_quantity")
    sz = F.col("p_size")
    br = F.col("p_brand")
    cond = (
        ((br == "Brand#13") & sz.between(1, 5) & qty.between(1, 11))
        | ((br == "Brand#25") & sz.between(1, 10) & qty.between(10, 20))
        | ((br == "Brand#9") & sz.between(1, 15) & qty.between(20, 30))
    )
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .where(cond)
        .agg(
            dround(F.sum(_rev())).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "tpch_q20",
    oracle="""
    WITH shipped AS (
      SELECT l.l_suppkey, sum(CAST(l.l_quantity AS DECIMAL(12,2))) AS qty
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_name LIKE 'small%'
        AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY l.l_suppkey
      HAVING sum(CAST(l.l_quantity AS DECIMAL(12,2))) > 100
    )
    SELECT s.s_suppkey, s.s_name, n.n_name AS nation
    FROM supplier s
    JOIN shipped sh ON s.s_suppkey = sh.l_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    ORDER BY s.s_suppkey
    """,
    doc="TPC-H Q20 potential part promotion, with lineitem standing in for "
    "partsupp availability: suppliers who shipped >100 units of "
    "small-named parts in 1997. The semi-join side is aggregated to "
    "~|suppliers| rows before touching supplier/nation, so both final "
    "joins stay broadcast-sized (planner-chosen).",
)
def tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = read_table(spark, sf_dir, "part").where(F.col("p_name").like("small%"))
    li = read_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    shipped = (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum(money(F.col("l_quantity"))).alias("qty"))
        .where(F.col("qty") > 100)
    )
    supp = read_table(spark, sf_dir, "supplier")
    nat = read_table(spark, sf_dir, "nation")
    return (
        supp.join(shipped, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", F.col("n_name").alias("nation"))
        .orderBy("s_suppkey")
    )


@register(
    "tpch_q21",
    oracle="""
    SELECT s.s_name, count(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o    ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 20
    """,
    doc="TPC-H Q21 suppliers-who-kept-orders-waiting; lateness = shipped "
    ">60 days after order (no receipt/commit dates). The EXISTS / NOT "
    "EXISTS pair become a left-semi then left-anti join on l_orderkey "
    "with the suppkey inequality in the join condition — three passes "
    "over lineitem, all shuffling on the same l_orderkey so AQE reuses "
    "the exchange; nothing collects.",
)
def tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    base = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
    late = base.where(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    ).select("l_orderkey", "l_suppkey", "o_orderdate")

    other = li.select(
        F.col("l_orderkey").alias("o2_orderkey"),
        F.col("l_suppkey").alias("o2_suppkey"),
        F.col("l_shipdate").alias("o2_shipdate"),
    )
    # EXISTS: another supplier has a line on the same order.
    waited = late.join(
        other,
        (F.col("l_orderkey") == F.col("o2_orderkey"))
        & (F.col("l_suppkey") != F.col("o2_suppkey")),
        "left_semi",
    )
    # NOT EXISTS: no OTHER supplier was also late on that order.
    sole_late = waited.join(
        other,
        (F.col("l_orderkey") == F.col("o2_orderkey"))
        & (F.col("l_suppkey") != F.col("o2_suppkey"))
        & (F.col("o2_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_anti",
    )
    supp = read_table(spark, sf_dir, "supplier")
    return (
        sole_late.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(20)
    )


@register(
    "tpch_q22",
    oracle="""
    WITH pos AS (
      SELECT sum(CAST(c_acctbal AS DECIMAL(12,2))) AS s, count(*) AS n
      FROM customer
      WHERE c_acctbal > 0 AND c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
    )
    SELECT CAST(c.c_nationkey AS VARCHAR) AS cntrycode,
           count(*) AS numcust,
           CAST(round(sum(CAST(c.c_acctbal AS DECIMAL(12,2))), 2) AS DOUBLE) AS totacctbal
    FROM customer c, pos
    WHERE c.c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
      AND CAST(c.c_acctbal AS DECIMAL(12,2)) * pos.n > pos.s
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    GROUP BY c.c_nationkey
    """,
    doc="TPC-H Q22 global sales opportunity (c_phone absent -> country code "
    "= c_nationkey; the spec's no-orders-in-7-years window becomes "
    "no-orders-since-2000 so the predicate selects at every SF). "
    "`acctbal > avg(acctbal)` is restated exact as acctbal * n > sum "
    "(DECIMAL cross-multiply, no rounded average); the scalar (sum, n) "
    "rides a single-row broadcast, inactive customers drop via a "
    "left-anti join on the date-filtered o_custkey side.",
)
def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    nations = [1, 3, 5, 7, 9, 11, 13]
    cust = read_table(spark, sf_dir, "customer").where(
        F.col("c_nationkey").isin(nations)
    )
    pos = (
        cust.where(F.col("c_acctbal") > 0)
        .agg(
            F.sum(money(F.col("c_acctbal"))).alias("s"),
            F.count("*").alias("n"),
        )
    )
    orders = (
        read_table(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp"))
        .select("o_custkey")
    )
    return (
        cust.join(F.broadcast(pos))
        .where(money(F.col("c_acctbal")) * F.col("n") > F.col("s"))
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").cast("string").alias("cntrycode"))
        .agg(
            F.count("*").alias("numcust"),
            dround(F.sum(money(F.col("c_acctbal")))).alias("totacctbal"),
        )
    )


# ---------------------------------------------------------------------------
# Q2 / Q11 — the two partsupp queries, over a DERIVED part-supplier
# relation: the distinct (l_partkey, l_suppkey) pairs actually shipped,
# with a deterministic hash-derived supply cost (portable_hash32 cents),
# so both engines build the identical synthetic partsupp.
# ---------------------------------------------------------------------------

from etl_cascalog_spark.catalog import register as _register  # noqa: E402
from etl_cascalog_spark.operators.sketches import (  # noqa: E402
    portable_hash32,
    portable_hash32_sql,
)

_PS_COST_SQL = f"""(
      SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
             ({portable_hash32_sql('l_partkey * 1000003 + l_suppkey')} % 10000)
               * CAST(0.01 AS DECIMAL(3,2)) AS ps_supplycost
      FROM lineitem
    )"""


def _partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    cost = (
        F.pmod(
            # cast BEFORE the multiply: the oracle evaluates in BIGINT, and
            # an int32 l_partkey would overflow the int multiply for
            # partkey >= ~2148 (ANSI throw or silent divergence)
            portable_hash32(
                F.col("l_partkey").cast("long") * 1000003
                + F.col("l_suppkey").cast("long")
            ),
            F.lit(10000),
        )
        * F.lit("0.01").cast("decimal(3,2)")
    )
    return (
        li.select("l_partkey", "l_suppkey")
        .distinct()
        .select(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
            cost.alias("ps_supplycost"),
        )
    )


@_register(
    "tpch_q2",
    oracle=f"""
    WITH ps AS {_PS_COST_SQL},
    candidates AS (
      SELECT p.p_partkey, p.p_retailprice, s.s_suppkey, s.s_name,
             n.n_name AS nation, ps.ps_supplycost
      FROM part p
      JOIN ps        ON ps.ps_partkey = p.p_partkey
      JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      JOIN region r   ON n.n_regionkey = r.r_regionkey
      WHERE p.p_size = 15 AND p.p_type = 'STANDARD' AND r.r_name = 'EUROPE'
    ),
    best AS (
      SELECT p_partkey, min(ps_supplycost) AS min_cost
      FROM candidates GROUP BY 1
    )
    SELECT c.p_partkey, c.p_retailprice, c.s_suppkey, c.s_name, c.nation,
           CAST(c.ps_supplycost AS DOUBLE) AS supplycost
    FROM candidates c JOIN best b
      ON c.p_partkey = b.p_partkey AND c.ps_supplycost = b.min_cost
    """,
    doc="TPC-H Q2 minimum-cost supplier (partsupp derived from shipped "
    "pairs, hash-derived DECIMAL cost — docstring at module Q2/Q11 "
    "banner). The correlated MIN subquery is a per-part aggregate "
    "joined back on (part, exact-DECIMAL cost equality) — ties keep "
    "all minimal suppliers, identically in both engines. Every "
    "non-partsupp relation stays planner-broadcastable; partsupp shuffles once on its "
    "own distinct.",
)
def tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = _partsupp(spark, sf_dir)
    part = read_table(spark, sf_dir, "part").where(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    )
    supp = read_table(spark, sf_dir, "supplier")
    nat = read_table(spark, sf_dir, "nation")
    reg = read_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    cand = (
        ps.join(part, F.col("ps_partkey") == F.col("p_partkey"))
        .join(supp, F.col("ps_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(
            "p_partkey",
            "p_retailprice",
            "s_suppkey",
            "s_name",
            F.col("n_name").alias("nation"),
            "ps_supplycost",
        )
    )
    best = cand.groupBy(F.col("p_partkey").alias("bp")).agg(
        F.min("ps_supplycost").alias("min_cost")
    )
    return (
        cand.join(
            F.broadcast(best),
            (F.col("p_partkey") == F.col("bp"))
            & (F.col("ps_supplycost") == F.col("min_cost")),
        )
        .select(
            "p_partkey",
            "p_retailprice",
            "s_suppkey",
            "s_name",
            "nation",
            F.col("ps_supplycost").cast("double").alias("supplycost"),
        )
    )


@_register(
    "tpch_q11",
    oracle=f"""
    WITH ps AS {_PS_COST_SQL},
    local AS (
      SELECT ps.ps_partkey, ps.ps_supplycost
      FROM ps
      JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      WHERE n.n_name = 'NATION_3'
    ),
    per_part AS (
      SELECT ps_partkey, sum(ps_supplycost) AS value_dec
      FROM local GROUP BY 1
    ),
    tot AS (SELECT sum(value_dec) AS total FROM per_part)
    SELECT p.ps_partkey,
           CAST(round(p.value_dec, 2) AS DOUBLE) AS stock_value
    FROM per_part p CROSS JOIN tot
    WHERE p.value_dec * 2000 > tot.total
    """,
    doc="TPC-H Q11 important stock (no availqty — value = summed derived "
    "supply cost of NATION_3's shipped part-supplier pairs). The "
    "HAVING-fraction threshold is cross-multiplied into exact DECIMAL "
    "(value * 2000 > total, i.e. value > 0.05% of total) — the same "
    "no-rounded-average discipline as Q17/Q22; the global total rides "
    "a single-row broadcast.",
)
def tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = _partsupp(spark, sf_dir)
    supp = read_table(spark, sf_dir, "supplier")
    nat = read_table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_3")
    local = (
        ps.join(supp, F.col("ps_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("ps_partkey", "ps_supplycost")
    )
    per_part = local.groupBy("ps_partkey").agg(
        F.sum("ps_supplycost").alias("value_dec")
    )
    tot = per_part.agg(F.sum("value_dec").alias("total"))
    return (
        per_part.join(F.broadcast(tot))
        .where(F.col("value_dec") * 2000 > F.col("total"))
        .select(
            "ps_partkey",
            F.round("value_dec", 2).cast("double").alias("stock_value"),
        )
    )
