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

from pyspark.sql import DataFrame
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

    ``dims`` is a list of (dim_df, on, how). Small dims get a broadcast hint
    so the fact side never shuffles for them.
    """
    out = fact
    for dim, on, how in dims:
        d = F.broadcast(dim) if broadcast_dims else dim
        out = out.join(d, on=on, how=how)
    return out


def left_lookup(fact: DataFrame, dim: DataFrame, on, broadcast: bool = True) -> DataFrame:
    """J2: the ``!!var`` probe — lookup that may miss
    (mlin:81 ``!!type-name``, :84 ``!!show-debut-dt``)."""
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
