"""Data-profiling / diagnostics operators.

Beyond-reference surface: the pre-flight checks a 100 TB run wants before
committing cluster hours — key-skew profiling (will this join/groupBy key
hot-spot an executor?) and sketch-based cardinality profiling (how many
distinct values per column, without a shuffle per column).

The reference had no profiling surface at all; its jobs discovered skew by
failing (single-reducer aggregates, ods/d_bolome_show.clj:51). Here skew is
measured declaratively first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def key_skew_profile(df: DataFrame, key_col: str, top_k: int = 5) -> DataFrame:
    """Key-frequency skew profile: the ``top_k`` heaviest keys with their
    row share, plus the global skew factor (max key size / mean key size —
    the multiplier the hottest shuffle partition carries vs the average).

    Returns ``(rank, <key>, cnt, share, skew_factor)``; ``skew_factor`` is
    repeated per row (it is a property of the whole key distribution).

    100 TB shape: ONE corpus-sized shuffle (the per-key count, map-side
    combined); the stats row and the heavy-hitter top-k are both
    aggregate-sized (TakeOrdered + broadcast scalar). Run it on a join key
    BEFORE the join: skew_factor ≳ 8 is the signal to salt
    (operators/joins.salted_join) or rely on AQE skew handling.
    """
    per_key = df.groupBy(key_col).agg(F.count("*").alias("cnt"))
    stats = per_key.agg(
        F.sum("cnt").alias("__total"),
        F.count("*").alias("__k"),
        F.max("cnt").alias("__m"),
    )
    from pyspark.sql import Window

    top = per_key.orderBy(F.col("cnt").desc(), key_col).limit(top_k)
    w = Window.orderBy(F.col("cnt").desc(), F.col(key_col))
    return (
        top.crossJoin(F.broadcast(stats))
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .select(
            "rank",
            key_col,
            F.col("cnt").cast("long").alias("cnt"),
            F.round(F.col("cnt").cast("double") / F.col("__total"), 6).alias(
                "share"
            ),
            F.round(
                (F.col("__m") * F.col("__k")).cast("double") / F.col("__total"),
                6,
            ).alias("skew_factor"),
        )
    )


def approx_distinct_profile(
    df: DataFrame, cols: list[str], rsd: float = 0.05
) -> DataFrame:
    """Sketch-based cardinality profile: per column, total rows, non-null
    rows, and the HyperLogLog++ approximate distinct count at relative
    standard deviation ``rsd``.

    Approximate by design → NOT an oracle-checked catalog query (DuckDB's
    HLL is a different sketch; estimates differ legitimately). The accuracy
    contract is pinned by unit tests instead (estimate within ~5·rsd of
    exact on known cardinalities).

    100 TB shape: ONE aggregate pass over the data for ALL columns (each
    HLL++ is a fixed-size register set merged map-side) — versus one
    count(DISTINCT) shuffle PER column for the exact answer. This is the
    profiling pass that sizes dimension tables for broadcast decisions.
    """
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"__n_{c}"),
            F.count(c).alias(f"__nn_{c}"),
            F.approx_count_distinct(c, rsd=rsd).alias(f"__ad_{c}"),
        ]
    row = df.agg(*aggs)
    parts = [
        F.struct(
            F.lit(c).alias("column"),
            F.col(f"__n_{c}").cast("long").alias("n_rows"),
            F.col(f"__nn_{c}").cast("long").alias("n_non_null"),
            F.col(f"__ad_{c}").cast("long").alias("approx_distinct"),
        )
        for c in cols
    ]
    return row.select(F.explode(F.array(*parts)).alias("p")).select("p.*")


def exact_column_profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """ANALYZE-style exact per-column profile: rows, non-null rows, exact
    distinct count, and TYPE-NATIVE min/max stringified at the edge (so
    mixed column types share one output schema while numeric columns keep
    numeric ordering — min over ``cast(c as string)`` would report
    lexicographic extremes like '10' < '9').

    Output: ``(column, n_rows, n_non_null, n_distinct, min_val, max_val)``,
    one row per profiled column.

    The catalog-statistics pass a planner (or a human sizing a broadcast)
    reads. One logical aggregate over the data: Spark executes the k
    distinct aggregates with a single scan plus an Expand (×k rows into
    the shuffle) — fine for a profiling pass over selected columns. At
    100 TB prefer :func:`approx_distinct_profile` (HLL++, no Expand, one
    fixed-size register set per column) and keep this as the audit tool
    on samples/dimensions.
    """
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"__n_{c}"),
            F.count(c).alias(f"__nn_{c}"),
            F.count_distinct(F.col(c)).alias(f"__nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__mn_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__mx_{c}"),
        ]
    row = df.agg(*aggs)
    parts = [
        F.struct(
            F.lit(c).alias("column"),
            F.col(f"__n_{c}").cast("long").alias("n_rows"),
            F.col(f"__nn_{c}").cast("long").alias("n_non_null"),
            F.col(f"__nd_{c}").cast("long").alias("n_distinct"),
            F.col(f"__mn_{c}").alias("min_val"),
            F.col(f"__mx_{c}").alias("max_val"),
        )
        for c in cols
    ]
    return row.select(F.explode(F.array(*parts)).alias("p")).select("p.*")
