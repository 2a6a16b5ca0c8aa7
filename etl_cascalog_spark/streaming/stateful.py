"""Custom stateful streaming operators via ``applyInPandasWithState``.

Beyond-reference surface (the reference is batch-only, SURVEY §2.9 I6):
arbitrary per-key state carried across micro-batches — the escape hatch for
semantics the built-in windowed aggregations can't express (running
accumulators with custom merge logic, cross-batch counters, custom
timeout-driven session emission).

Scale notes: state lives in the executor-local state store keyed by the
grouping key (one shuffle on user_id per micro-batch, same as a streaming
groupBy); Arrow batches cross the Python boundary per key-group. State per
key here is O(1) (three scalars), so 100 TB of history costs
``n_distinct_keys × bytes(state)`` in the store — bounded, checkpointable,
and rescalable via state-store repartitioning.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: output schema of :func:`running_user_totals`
RUNNING_TOTALS_SCHEMA = (
    "user_id bigint, n_events bigint, total_value double, max_value double"
)
_STATE_SCHEMA = "n bigint, total double, maxv double"


def _update_running_totals(
    key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold this micro-batch's rows for one user into the carried state and
    emit the updated running totals (one row per key per batch)."""
    if state.exists:
        n, total, maxv = state.get
    else:
        n, total, maxv = 0, 0.0, float("-inf")
    for pdf in pdfs:
        vals = pdf["value"].dropna()
        n += len(pdf)
        total += float(vals.sum())
        if len(vals):
            maxv = max(maxv, float(vals.max()))
    state.update((n, total, maxv))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [round(total, 2)],
            "max_value": [maxv if maxv != float("-inf") else None],
        }
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running (cross-micro-batch) event count / value sum / max —
    custom stateful aggregation over ``applyInPandasWithState``.

    Unlike ``groupBy(...).agg`` in complete mode (which recomputes and keeps
    every group's full aggregation state), this carries exactly the three
    scalars per user and emits per micro-batch in update mode.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _update_running_totals,
        outputStructType=RUNNING_TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
