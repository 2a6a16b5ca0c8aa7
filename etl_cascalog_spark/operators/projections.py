"""Projection / rename / row construction (SURVEY.md §2.2, P1-P6).

Mostly thin, deliberately: rule heads map to ``select``; the value here is
API parity with the reference's helpers.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def select_fields(df: DataFrame, *names: str) -> DataFrame:
    """P2 ``select-fields`` (trgx.clj:112,142,149): project a subset by name."""
    return df.select(*names)


def rename_all(df: DataFrame, *names: str) -> DataFrame:
    """P3 ``ops/rename*`` (mlin/d_bolome_user_order.clj:89-92): positional
    rename of every output field."""
    return df.toDF(*names)


def bind_constants(df: DataFrame, constants: Mapping[str, object]) -> DataFrame:
    """P4 identity-binding of constants (m_cocacola_score_overall.clj:71)."""
    out = df
    for name, value in constants.items():
        out = out.withColumn(name, F.lit(value))
    return out


def wildcard_project(df: DataFrame, prefix: str | None = None) -> list[Column]:
    """P5 arity-generic projection (num-out-fields + gen-nullable-vars,
    trgx.clj:145,291): all current columns, optionally re-aliased with a
    prefix — schema introspection replaces generated var names."""
    return [
        F.col(c).alias(f"{prefix}{c}") if prefix else F.col(c) for c in df.columns
    ]


def broadcast_config_map(
    spark: SparkSession,
    config_df: DataFrame,
    key_col: str,
    value_col: str,
) -> Column:
    """J5: the plan-time config join (latest-trgx-merge, trgx.clj:198-207):
    collect a small config table on the driver ONCE at plan construction
    and bake it into the plan as a literal map column — a map-side lookup
    with zero join, exactly the reference's closure-captured config tree.

    Use only for genuinely tiny config relations (the reference's was a
    handful of rows); anything bigger belongs in a broadcast join (J2).
    """
    rows = config_df.select(key_col, value_col).collect()
    entries: list[Column] = []
    for r in rows:
        entries.extend([F.lit(r[key_col]), F.lit(r[value_col])])
    return F.create_map(*entries)


def apply_each(fn, *cols: Column) -> list[Column]:
    """§2.10 ``c/each`` (48 uses in the reference, e.g.
    m_cocacola_score_channel.clj:83): apply one scalar fn to N columns →
    N result columns. In Python this is a comprehension; the helper exists
    for discoverability/parity."""
    return [fn(c) for c in cols]


def apply_juxt(col: Column, *fns) -> list[Column]:
    """§2.10 ``c/juxt`` (31 uses, e.g. the three lag keys at
    m_cocacola_score_channel.clj:54): apply N fns to one column → N
    result columns."""
    return [fn(col) for fn in fns]
