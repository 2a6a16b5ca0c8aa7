"""Surrogate-key assignment (A8 / E2).

Reference: the ``row-num`` aggregator (trgx.clj:172-186) continues ids from
the current max (``load-max-dw-id`` trgx.clj:166-170) but forces a **single
global group** — ``(identity 0 :> ?prt-no)`` at ods/d_bolome_show.clj:51 — a
serialized reduce through one reducer. At 100 TB that is the whole job.

Spark-first replacement: a window ``row_number`` over a total ordering +
driver-side max offset. Still one shuffle, but a *parallel* range-partitioned
sort, not a single reducer. For id-assignment where density doesn't matter,
``zipWithIndex``-free ``monotonically_increasing_id`` + rebase is cheaper
(no shuffle at all) — both are offered.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def assign_dense_ids(
    df: DataFrame,
    order_by: Sequence[str],
    id_col: str = "dw_id",
    start_at: int = 1,
) -> DataFrame:
    """Dense, deterministic, gap-free ids continuing from ``start_at``.

    Matches the reference semantics (contiguous dw_id from max+1,
    d_bolome_show.clj:52-53) with a parallel range-sort instead of the
    single-reducer trick. Use for dimension tables (where the sort input is
    the *new* rows only, usually small relative to the fact volume).
    """
    w = Window.orderBy(*[F.col(c) for c in order_by])
    return df.withColumn(id_col, F.row_number().over(w) + F.lit(start_at - 1))


def assign_sparse_ids(df: DataFrame, id_col: str = "dw_id", start_at: int = 1) -> DataFrame:
    """Gap-tolerant unique ids with **zero shuffle**: partition-local
    monotonic ids rebased onto a global offset. The scale path when density
    is not required — each task numbers its own rows."""
    return df.withColumn(
        id_col, F.monotonically_increasing_id() + F.lit(start_at)
    )


def current_max_id(df: DataFrame, id_col: str = "dw_id") -> int:
    """I3 ``load-max-dw-id`` (trgx.clj:166-170): the continuation offset."""
    row = df.agg(F.max(F.col(id_col)).alias("m")).collect()[0]
    return int(row["m"]) if row["m"] is not None else 0
