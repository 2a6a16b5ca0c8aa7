"""Conditionals & null handling (X6, F9) — all JVM-side Column exprs.

Reference sites (``/root/reference/src``):

- ``cif``/``nvl2``        — bolome/mlin/d_bolome_user_order.clj:45-46
- ``cor`` (coalesce)      — mlin:47
- ``or-tuple``            — common/trgx.clj:21 (pairwise coalesce of two rows'
                            columns in the stg-vs-ods full-outer merge J3)
- ``str-least``           — mlin:48
- ``c>``/``c>*``          — mlin:64-65 (null-safe compare)
- ``compare-mark*``       — mlin:50  ([lt eq gt] flag triple)
- ``mark*``               — mlin:49  (equality flag per candidate value)
- ``convert-null``        — trgx.clj:20 ("null"/"NULL" string → real NULL)
- null-safe delta         — cocacola/rpt/m_cocacola_score_channel.clj:58-60

X4 string functions (substring/concat/split/regexp_replace/lower,
m_cocacola_score_overall.clj:64-65 etc.) are native Column methods —
exercised in the scalar_kitchen_sink catalog query.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def cif(cond: Column, then: Column, otherwise: Column) -> Column:
    """mlin:45 — if/else as an expression."""
    return F.when(cond, then).otherwise(otherwise)


def nvl2(x: Column, not_null_val: Column, null_val: Column) -> Column:
    """mlin:46 — x IS NOT NULL ? a : b."""
    return F.when(x.isNotNull(), not_null_val).otherwise(null_val)


def cor(*cols: Column) -> Column:
    """mlin:47 — first non-null (COALESCE)."""
    return F.coalesce(*cols)


def or_tuple(a: Column, b: Column) -> Column:
    """trgx.clj:21 — pairwise coalesce used field-by-field after the
    full-outer stg⋈ods merge (ods/d_bolome_show.clj:42-50): take the staging
    value when present, else the ods value."""
    return F.coalesce(a, b)


def str_least(*cols: Column) -> Column:
    """mlin:48 — minimum of string-typed values (lexicographic; date strings
    in yyyy-MM-dd order correctly)."""
    return F.least(*cols)


def c_gt(a: Column, b: Column) -> Column:
    """mlin:64-65 null-safe ``c>``: NULL if either side NULL, else a > b."""
    return F.when(a.isNull() | b.isNull(), F.lit(None).cast("boolean")).otherwise(a > b)


def compare_mark(a: Column, b: Column) -> list[Column]:
    """mlin:50 — [lt, eq, gt] as 0/1 flags (NULL-propagating)."""
    base = F.when(a.isNull() | b.isNull(), F.lit(None).cast("int"))
    return [
        base.otherwise((a < b).cast("int")),
        base.otherwise((a == b).cast("int")),
        base.otherwise((a > b).cast("int")),
    ]


def mark(col: Column, *candidates) -> list[Column]:
    """mlin:49 — one 0/1 flag per candidate value (one-hot)."""
    return [(col == F.lit(c)).cast("int").alias(f"mark_{i}") for i, c in enumerate(candidates)]


def convert_null(col: Column) -> Column:
    """F9 trgx.clj:20 — the literal strings "null"/"NULL" (any case) become
    real NULL; everything else passes through."""
    return F.when(F.lower(col) == "null", F.lit(None)).otherwise(col)


def null_safe_delta(a: Column, b: Column) -> Column:
    """m_cocacola_score_channel.clj:58-60 — ``(if (nil? b) nil (- a b))``:
    the delta vs a missing comparison period is NULL, not a - 0."""
    return F.when(b.isNull() | a.isNull(), F.lit(None).cast("double")).otherwise(a - b)
