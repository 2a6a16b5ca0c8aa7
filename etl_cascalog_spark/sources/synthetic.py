"""Deterministic synthetic-events generator as a Spark 4 Python
DataSource — the scale-done-right version of the reference's in-memory
generator taps (S2/S3, `src/common/trgx.clj` generators feed literal
sequences through the same query machinery as table scans).

Why a DataSource and not ``spark.createDataFrame(rows)``: a literal
frame materializes ON THE DRIVER and ships through the task closure —
fine for 20 config rows (J5), fatal for load-test/backfill volumes. This
source generates rows INSIDE each task from (seed, row-index) alone:

- **embarrassingly parallel** — ``n_partitions`` InputPartitions, each
  derives its own [start, end) index range; zero driver data, zero
  shuffle;
- **deterministic** — every column is a pure function of
  ``splitmix64(seed, i)``; same options ⇒ identical table on ANY
  cluster/partitioning (the property the oracle tests pin);
- **Arrow-batched** — partitions yield pyarrow RecordBatches built from
  numpy vectors (the fast path across the Python boundary; never
  per-row tuples);
- **filter pushdown** — ``pushFilters`` accepts equality/range predicates
  on ``event_id`` and equality/IN on ``event_type``; supported filters
  shrink the generated index range (range filters) or mask vectorized
  (type filters) BEFORE rows cross into the JVM, and Spark re-applies
  nothing (they're consumed). Unsupported filters are returned and stay
  in the plan — the standard pushdown contract.

Usage::

    spark.dataSource.register(SyntheticEventsDataSource)
    df = (spark.read.format("synthetic_events")
          .option("n_rows", 1_000_000).option("seed", 42)
          .option("n_partitions", 32).load())
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENT_TYPES = ("click", "view", "purchase", "error")

#: epoch micros of 2024-01-01T00:00:00Z — generated ts base
_TS0_US = 1_704_067_200_000_000

SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ]
)


def _splitmix64_np(x):
    """Vectorized splitmix64 finalizer (public-domain PRNG mix) over a
    uint64 numpy array — the per-row entropy source."""
    import numpy as np

    z = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


@dataclass(frozen=True)
class _RangePartition(InputPartition):
    start: int
    end: int
    seed: int


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", 10_000))
        self.n_partitions = int(options.get("n_partitions", 8))
        self.seed = int(options.get("seed", 42))
        self.batch_rows = int(options.get("batch_rows", 65_536))
        # pushdown state: index range on event_id, allowed event types
        self.lo = 0
        self.hi = self.n_rows  # exclusive
        self.types: tuple[str, ...] | None = None

    def pushFilters(self, filters):
        # eager, not a generator: the range/type narrowing must happen
        # unconditionally before partitions() — a lazily-iterated
        # generator would make the side effects depend on whether Spark
        # drains the unsupported-filter iterator
        unsupported: list[Filter] = []
        for f in filters:
            attr = tuple(getattr(f, "attribute", ()) or ())
            if attr == ("event_id",):
                if isinstance(f, EqualTo):
                    self.lo = max(self.lo, int(f.value))
                    self.hi = min(self.hi, int(f.value) + 1)
                elif isinstance(f, GreaterThan):
                    self.lo = max(self.lo, int(f.value) + 1)
                elif isinstance(f, GreaterThanOrEqual):
                    self.lo = max(self.lo, int(f.value))
                elif isinstance(f, LessThan):
                    self.hi = min(self.hi, int(f.value))
                elif isinstance(f, LessThanOrEqual):
                    self.hi = min(self.hi, int(f.value) + 1)
                else:
                    unsupported.append(f)  # shape stays in the plan
            elif attr == ("event_type",):
                if isinstance(f, EqualTo):
                    self.types = (str(f.value),)
                elif isinstance(f, In):
                    self.types = tuple(str(v) for v in f.values)
                else:
                    unsupported.append(f)
            else:
                unsupported.append(f)  # consumed nothing — Spark keeps it
        return unsupported

    def partitions(self):
        lo, hi = self.lo, max(self.lo, self.hi)
        n = max(1, self.n_partitions)
        span = hi - lo
        step = (span + n - 1) // n if span else 1
        return [
            _RangePartition(s, min(s + step, hi), self.seed)
            for s in range(lo, hi, step)
        ] or [_RangePartition(0, 0, self.seed)]

    def read(self, partition: _RangePartition):
        import numpy as np
        import pyarrow as pa

        # 64-bit wraparound is the point of the mix — keep the seed fold in
        # Python ints (masked) so numpy never warns on intended overflow
        seed_mix = np.uint64(
            (partition.seed * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
        )
        for b0 in range(partition.start, partition.end, self.batch_rows):
            b1 = min(b0 + self.batch_rows, partition.end)
            idx = np.arange(b0, b1, dtype=np.uint64)
            with np.errstate(over="ignore"):
                h = _splitmix64_np(idx + seed_mix)
            ts_us = _TS0_US + (idx.astype(np.int64) * 1_000_000) + (h % np.uint64(1000)).astype(np.int64) * 1000
            user_id = (h % np.uint64(10_000)).astype(np.int64)
            type_idx = ((h >> np.uint64(16)) % np.uint64(len(EVENT_TYPES))).astype(np.int64)
            value = np.round(((h >> np.uint64(24)) % np.uint64(100_000)).astype(np.float64) / 100.0, 2)
            types = np.array(EVENT_TYPES, dtype=object)[type_idx]
            mask = None
            if self.types is not None:
                mask = np.isin(types, self.types)
                if not mask.any():
                    continue
            cols = {
                "event_id": idx.astype(np.int64),
                "ts": ts_us,
                "user_id": user_id,
                "event_type": types,
                "value": value,
            }
            if mask is not None:
                cols = {k: v[mask] for k, v in cols.items()}
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(cols["event_id"], type=pa.int64()),
                    pa.array(cols["ts"], type=pa.timestamp("us")),
                    pa.array(cols["user_id"], type=pa.int64()),
                    pa.array(cols["event_type"], type=pa.string()),
                    pa.array(cols["value"], type=pa.float64()),
                ],
                schema=pa.schema(
                    [
                        ("event_id", pa.int64()),
                        ("ts", pa.timestamp("us")),
                        ("user_id", pa.int64()),
                        ("event_type", pa.string()),
                        ("value", pa.float64()),
                    ]
                ),
            )


class SyntheticEventsDataSource(DataSource):
    """``format("synthetic_events")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> StructType:
        return SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return SyntheticEventsReader(self.options)

    def simpleStreamReader(self, schema: StructType):
        # resolved at call time — class defined below
        return SyntheticEventsStreamReader(self.options)


class SyntheticEventsRateDataSource(DataSource):
    """``format("synthetic_events_rate")`` — the rate-limited,
    partition-PARALLEL streaming flavor (Kafka-shaped without a broker):
    offsets live on the driver, data is generated executor-side. See
    :class:`SyntheticEventsParallelStreamReader`."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events_rate"

    def schema(self) -> StructType:
        return SCHEMA

    def streamReader(self, schema: StructType):
        return SyntheticEventsParallelStreamReader(self.options)


# ---------------------------------------------------------------------------
# Streaming flavor: the same deterministic generator as an unbounded source
# ---------------------------------------------------------------------------

from pyspark.sql.datasource import (  # noqa: E402
    DataSourceStreamReader,
    SimpleDataSourceStreamReader,
)


def _gen_rows(start: int, end: int, seed: int):
    """Row tuples for index range [start, end) — the same (seed, index)
    derivation as the batch reader (shared so batch and stream agree)."""
    import datetime as _dt

    import numpy as np

    if end <= start:
        return
    idx = np.arange(start, end, dtype=np.uint64)
    seed_mix = np.uint64((seed * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF)
    with np.errstate(over="ignore"):
        h = _splitmix64_np(idx + seed_mix)
    ts_us = (
        _TS0_US
        + (idx.astype(np.int64) * 1_000_000)
        + (h % np.uint64(1000)).astype(np.int64) * 1000
    )
    user_id = (h % np.uint64(10_000)).astype(np.int64)
    type_idx = ((h >> np.uint64(16)) % np.uint64(len(EVENT_TYPES))).astype(np.int64)
    value = np.round(
        ((h >> np.uint64(24)) % np.uint64(100_000)).astype(np.float64) / 100.0, 2
    )
    utc = _dt.timezone.utc
    for i in range(len(idx)):
        yield (
            int(idx[i]),
            _dt.datetime.fromtimestamp(ts_us[i] / 1e6, tz=utc).replace(tzinfo=None),
            int(user_id[i]),
            EVENT_TYPES[type_idx[i]],
            float(value[i]),
        )


class SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
    """Unbounded twin of the batch reader: offsets are plain row indices,
    each micro-batch advances by ``rows_per_batch``. Deterministic —
    re-reading any offset range reproduces identical rows, which is
    exactly the replayability contract (kafka-style) structured streaming
    needs for exactly-once recovery; ``readBetweenOffsets`` IS that
    replay path. The Simple reader API feeds rows through the driver —
    right for tests/modest rates; a partition-parallel
    DataSourceStreamReader with the same offset math is the scale path.
    """

    def __init__(self, options):
        self.seed = int(options.get("seed", 42))
        self.rows_per_batch = int(options.get("rows_per_batch", 1000))

    def initialOffset(self) -> dict:
        return {"index": 0}

    def read(self, start: dict):
        s = int(start["index"])
        e = s + self.rows_per_batch
        # materialized list, not a generator: the runner's prefetch cache
        # shallow-copies the row iterator (generators aren't copyable)
        return list(_gen_rows(s, e, self.seed)), {"index": e}

    def readBetweenOffsets(self, start: dict, end: dict):
        return list(_gen_rows(int(start["index"]), int(end["index"]), self.seed))


class SyntheticEventsParallelStreamReader(DataSourceStreamReader):
    """Rate-limited, partition-parallel streaming reader — the
    Kafka-shaped scale path the Simple reader's docstring promises:

    - **offsets on the driver, data on the executors**: ``latestOffset``
      only advances an integer row index; ``partitions(start, end)``
      splits [start, end) into ``n_partitions`` ranges and ``read`` runs
      in the executors' Python workers, generating Arrow-friendly tuples
      from (seed, index) — the driver never touches row data (the Simple
      reader feeds rows through the driver; this one doesn't).
    - **rate-limited like the built-in rate source**: the target offset
      is ``rows_per_second × elapsed-wall-clock``, capped at
      ``max_batch_rows`` per micro-batch (backpressure: a slow batch
      doesn't snowball the next one).
    - **replayable by construction**: rows are pure functions of
      (seed, index), so re-reading any committed offset range after a
      driver crash reproduces byte-identical rows — the exactly-once
      recovery contract an external broker provides with retention, here
      provided by determinism (proven by a kill-resume test that SIGKILLs
      the driver mid-stream and resumes from the checkpoint).
    - **restart-safe offsets**: after a driver kill the reader's wall
      clock restarts but the checkpoint's offset doesn't; until the
      engine reveals the committed position (via ``partitions``/
      ``commit``) the target could lag it, so ``partitions`` clamps
      ``end = max(start, end)`` (an empty first batch, never a backwards
      range) and the internal index ratchets up to every start/commit
      position it sees.
    """

    def __init__(self, options):
        self.seed = int(options.get("seed", 42))
        self.rows_per_second = int(options.get("rows_per_second", 10_000))
        self.n_partitions = int(options.get("n_partitions", 4))
        self.max_batch_rows = int(options.get("max_batch_rows", 100_000))
        self._t0: float | None = None
        self._base = 0  # offset the rate budget is measured FROM
        self._index = 0  # highest offset handed to the engine

    def initialOffset(self) -> dict:
        return {"index": 0}

    def latestOffset(self) -> dict:
        import time

        now = time.monotonic()
        if self._t0 is None:
            self._t0 = now
            self._base = self._index
        budget = self._base + int((now - self._t0) * self.rows_per_second)
        target = min(budget, self._index + self.max_batch_rows)
        self._index = max(self._index, target)
        return {"index": self._index}

    def _ratchet(self, off: int) -> None:
        """Credit an engine-revealed offset (a checkpointed start, a
        commit) as already-produced: a restart resumes from the
        checkpoint's position, which outruns a freshly-started wall
        clock — without RE-BASING the rate budget there, the stream
        starves until ``elapsed × rate`` catches up to the old offset
        (observed: a 1.85M-row checkpoint froze a 100k rows/s resume for
        ~18 s). The budget clock restarts at the ratcheted offset."""
        import time

        if off > self._index:
            self._index = off
        if self._t0 is not None:
            budget = self._base + int(
                (time.monotonic() - self._t0) * self.rows_per_second
            )
            if off > budget:
                self._base = off
                self._t0 = time.monotonic()

    def partitions(self, start: dict, end: dict):
        s, e = int(start["index"]), int(end["index"])
        self._ratchet(max(s, e))
        e = max(s, e)  # never a backwards range after a restart
        if e == s:
            return []
        n = max(1, self.n_partitions)
        step = (e - s + n - 1) // n
        return [
            _RangePartition(p, min(p + step, e), self.seed)
            for p in range(s, e, step)
        ]

    def read(self, partition: _RangePartition):
        # executor-side: same (seed, index) derivation as the batch reader
        return _gen_rows(partition.start, partition.end, partition.seed)

    def commit(self, end: dict) -> None:
        # offsets below `end` are durable in the checkpoint; nothing to
        # retire — determinism IS the retention
        self._ratchet(int(end["index"]))
