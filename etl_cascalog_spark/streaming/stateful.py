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


# ---------------------------------------------------------------------------
# Spark 4 transformWithState surface (the successor API)
# ---------------------------------------------------------------------------

try:  # pragma: no cover - import guard for older/slim runtimes
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    # the transformWithState Python<->JVM state-server protocol is
    # protobuf-based; a runtime without a working google.protobuf (this
    # sandbox) crashes the driver worker at query start, so the
    # capability gate probes BOTH the API and its wire dependency
    from google.protobuf import descriptor as _pb_descriptor  # noqa: F401

    HAS_TRANSFORM_WITH_STATE = True
except ImportError:  # pragma: no cover
    StatefulProcessor = object  # type: ignore[assignment,misc]
    HAS_TRANSFORM_WITH_STATE = False


class RunningTotalsProcessor(StatefulProcessor):
    """Per-user running totals as a Spark 4 ``StatefulProcessor`` — the
    ``transformWithStateInPandas`` twin of :func:`running_user_totals`.

    Why both: ``applyInPandasWithState`` is the 3.x-era API (one opaque
    state tuple, timeout enum); ``transformWithState`` is its successor
    with COMPOSABLE state primitives (value/list/map state, per-key
    timers, TTL) behind a handle — the shape arbitrary production
    stateful operators (cross-batch counters, custom session emission,
    CDC caches) actually need. State here is one 3-field ValueState per
    user; the state store scaling story is identical (keyed by group,
    one shuffle per micro-batch, rescalable/checkpointable).
    """

    def init(self, handle: "StatefulProcessorHandle") -> None:
        self._totals = handle.getValueState(
            "totals", "n bigint, total double, maxv double"
        )

    def handleInputRows(self, key, rows, timerValues):
        if self._totals.exists():
            n, total, maxv = self._totals.get()
        else:
            n, total, maxv = 0, 0.0, None
        for pdf in rows:
            vals = pdf["value"].dropna()
            n += len(pdf)
            total += float(vals.sum())
            if len(vals):
                vmax = float(vals.max())
                maxv = vmax if maxv is None else max(maxv, vmax)
        self._totals.update((n, total, maxv))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [round(total, 2)],
                "max_value": [maxv],
            }
        )

    def close(self) -> None:
        pass


def running_user_totals_tws(events: DataFrame) -> DataFrame:
    """Per-user running totals via ``transformWithStateInPandas`` (Spark
    4's arbitrary-stateful API). Output contract is identical to
    :func:`running_user_totals` — the equivalence test pins both to the
    same batch twin.

    transformWithState runs ONLY on the RocksDB state store (the
    HDFS-backed default store lacks the multi-column-family layout its
    composable state primitives need), so the provider is pinned here;
    RocksDB is also the store you want at scale (incremental
    checkpointing, state larger than executor heap)."""
    events.sparkSession.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    return events.groupBy("user_id").transformWithStateInPandas(
        RunningTotalsProcessor(),
        outputStructType=RUNNING_TOTALS_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
