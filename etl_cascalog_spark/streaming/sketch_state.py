"""Streaming HyperLogLog: running distinct-count estimates as compact
keyed state.

The batch half (``operators/sketches.hll_registers`` / ``hll_estimate``)
stores per-group register maxes and re-merges them; this module carries
the SAME register state across micro-batches via
``applyInPandasWithState`` — per group the state is one 256-slot register
vector (≤ ~1 KB), updated by elementwise max and never growing with the
number of distinct keys seen. That is the entire point of sketching a
streaming distinct: an exact streaming count-distinct must keep every key
in state (unbounded), while the register state is O(m) forever.

The hash is the same ``portable_hash32`` arithmetic (replicated here over
numpy uint64 — every product < 2^63, so no wrap), which makes the
streaming estimate EQUAL to the batch estimate over the same rows — the
equivalence test pins streaming-vs-batch bit-for-bit, the strongest
check available for a custom stateful operator (same discipline as the
other streaming twins in tests/test_streaming.py).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_P = 8
_M = 1 << _P
_W = 32 - _P
_SCALE = _W + 1
_ALPHA = 0.7213 / (1.0 + 1.079 / _M)

HLL_OUTPUT_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("n_registers_hit", LongType()),
        StructField("est_distinct", DoubleType()),
    ]
)
_STATE_SCHEMA = StructType([StructField("regs", ArrayType(IntegerType()))])


def _mix32(keys: np.ndarray) -> np.ndarray:
    """portable_hash32 over numpy uint64 — identical arithmetic to the
    Column/SQL versions (products < 2^63, masked back to 32 bits)."""
    m32 = np.uint64(0xFFFFFFFF)
    h = keys.astype(np.uint64) & m32
    for _ in range(2):
        h = ((h >> np.uint64(16)) ^ h) * np.uint64(0x45D9F3B) & m32
    return (h >> np.uint64(16)) ^ h


def _batch_registers(keys: np.ndarray) -> np.ndarray:
    """Register-max vector (length m, 0 = empty) for one batch of keys."""
    regs = np.zeros(_M, dtype=np.int32)
    if len(keys) == 0:
        return regs
    h = _mix32(keys)
    j = (h >> np.uint64(_W)).astype(np.int64)
    w = (h & np.uint64((1 << _W) - 1)).astype(np.int64)
    # rho = W - bitlen(w) + 1 (W+1 when w == 0); small batches, so the
    # per-element int.bit_length is fine — the hot path is JVM-side batch
    bl = np.array([int(x).bit_length() for x in w], dtype=np.int64)
    rho = np.where(w == 0, _W + 1, _W - bl + 1)
    np.maximum.at(regs, j, rho)
    return regs


def _estimate(regs: np.ndarray) -> tuple[int, float]:
    present = regs > 0
    n_present = int(present.sum())
    v = _M - n_present
    s = int((np.int64(1) << (_SCALE - regs[present])).sum()) + v * (1 << _SCALE)
    e = _ALPHA * _M * _M * float(1 << _SCALE) / s
    if e <= 2.5 * _M and v > 0:
        e = float(_M) * float(np.log(float(_M) / v))
    return n_present, round(e, 2)


def _update_hll(
    key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    regs = (
        np.array(state.get[0], dtype=np.int32)
        if state.exists
        else np.zeros(_M, dtype=np.int32)
    )
    for pdf in pdfs:
        regs = np.maximum(regs, _batch_registers(pdf["user_id"].to_numpy()))
    state.update(([int(x) for x in regs],))
    n_present, est = _estimate(regs)
    yield pd.DataFrame(
        {
            "event_type": [key[0]],
            "n_registers_hit": [n_present],
            "est_distinct": [est],
        }
    )


def running_distinct_users_hll(events: DataFrame) -> DataFrame:
    """Per-event-type running distinct-user ESTIMATE over the stream:
    O(m) state per group forever, emitted each micro-batch in update
    mode. Equals the batch ``hll_distinct`` over the same rows
    (equivalence-tested)."""
    return events.groupBy("event_type").applyInPandasWithState(
        _update_hll,
        outputStructType=HLL_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
