"""Data-quality validation checks → one report row per check.

Beyond-reference (the reference's only guard was audit-row bookkeeping,
``hadoop/import_increment.clj`` load ranges — SURVEY §2.9 I2); every
warehouse/training pipeline needs declarative output validation before
publish. Each check is a plain aggregate over the checked frame; a report
is the union of single-row aggregates — all tiny, so the presentation
union is cheap (unlike the funnel/rollup presentation trap, each branch
here is a DIFFERENT computation and must run anyway).

100 TB posture: every check is one aggregation pass (count-shaped, partial
aggregation does the heavy lifting map-side); FK orphan checks are
broadcast anti joins when the dimension is dimension-sized. Compose with
``io.publish_atomic``: validate the staged frame, publish only if
``violations == 0`` (the CI gate shape).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _report(name: str, df: DataFrame, violations: F.Column, checked: F.Column) -> DataFrame:
    return df.agg(
        F.lit(name).alias("check"),
        checked.cast("long").alias("checked"),
        violations.cast("long").alias("violations"),
    ).select(
        "check", "checked", "violations",
        (F.col("violations") == 0).alias("passed"),
    )


def expect_unique(df: DataFrame, cols: Sequence[str], name: str | None = None) -> DataFrame:
    """Key-uniqueness check: violations = rows beyond the first per key."""
    dup = df.groupBy(*[F.col(c) for c in cols]).agg(F.count(F.lit(1)).alias("__n"))
    return _report(
        name or f"unique({','.join(cols)})",
        dup,
        F.sum(F.col("__n") - 1),
        F.sum("__n"),
    )


def expect_no_nulls(df: DataFrame, cols: Sequence[str], name: str | None = None) -> DataFrame:
    """NOT-NULL check over one or more columns (violations = total nulls)."""
    nulls = sum(
        (F.count(F.when(F.col(c).isNull(), 1)) for c in cols), F.lit(0)
    )
    return _report(
        name or f"not_null({','.join(cols)})", df, nulls, F.count(F.lit(1)) * len(cols)
    )


def expect_fk(
    fact: DataFrame,
    fact_key: str,
    dim: DataFrame,
    dim_key: str,
    name: str | None = None,
) -> DataFrame:
    """Referential-integrity check: violations = fact rows whose key has no
    dimension match (broadcast anti join — dimension-sized build side)."""
    orphans = fact.join(
        F.broadcast(dim.select(F.col(dim_key).alias(fact_key)).distinct()),
        on=fact_key,
        how="left_anti",
    )
    n_orphans = orphans.agg(F.count(F.lit(1)).alias("__v"))
    n_total = fact.agg(F.count(F.lit(1)).alias("__c"))
    return (
        n_orphans.crossJoin(n_total)
        .select(
            F.lit(name or f"fk({fact_key})").alias("check"),
            F.col("__c").cast("long").alias("checked"),
            F.col("__v").cast("long").alias("violations"),
            (F.col("__v") == 0).alias("passed"),
        )
    )


def expect_in_range(
    df: DataFrame,
    col: str,
    lo: float | None = None,
    hi: float | None = None,
    name: str | None = None,
) -> DataFrame:
    """Domain check: violations = non-null values outside [lo, hi]."""
    c = F.col(col)
    cond = F.lit(False)
    if lo is not None:
        cond = cond | (c < lo)
    if hi is not None:
        cond = cond | (c > hi)
    return _report(
        name or f"range({col})",
        df,
        F.count(F.when(c.isNotNull() & cond, 1)),
        F.count(F.lit(1)),
    )


def validation_report(checks: Sequence[DataFrame]) -> DataFrame:
    """Union the single-row check frames into the publish-gate report."""
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out
