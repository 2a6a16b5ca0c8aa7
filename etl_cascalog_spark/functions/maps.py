"""Map/array helpers (X7) — the reference's in-tuple dict algebra.

Reference (``/root/reference/src/common/trgx.clj``):

- ``vars->kv`` (:46)  — zip column names/values into a map
- ``kv->lkp`` (:60)   — probe one map with several keys at once (the heart of
  the calendar-lag pattern, §2.6 step 4)
- ``pad`` (:249)      — right-pad a seq to fixed length
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def vars_to_kv(pairs: dict[str, Column]) -> Column:
    """trgx.clj:46 — literal-keyed map column from named values."""
    entries = []
    for k, v in pairs.items():
        entries.extend([F.lit(k), v])
    return F.create_map(*entries)


def kv_lookup(kv: Column, *keys: Column) -> list[Column]:
    """trgx.clj:60 ``kv->lkp``: probe a map column with several keys; missing
    keys yield NULL (this is what gives the calendar-lag its NULL-on-missing-
    month semantics, m_cocacola_score_channel.clj:56)."""
    return [F.element_at(kv, k) for k in keys]


def pad_array(arr: Column, n: int, fill: Column) -> Column:
    """trgx.clj:249 — right-pad an array to length n with ``fill``."""
    return F.concat(
        arr,
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.lit(0), F.lit(n) - F.size(arr))),
            lambda _: fill,
        ),
    )
