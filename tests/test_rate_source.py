"""The rate-limited, partition-parallel streaming source (VERDICT r8 #6):
Kafka-shaped offsets without a broker.

Covers the three contracts an external-broker source provides:

1. **offset/replay determinism** — the stream's rows for offset range
   [0, N) are byte-identical to the batch reader's rows for the same
   (seed, index) range (determinism IS the retention);
2. **exactly-once across a real driver KILL** — phase A streams into a
   parquet file sink and is SIGKILLed mid-flight (no graceful stop, no
   sink flush); phase B resumes from the same checkpoint in a fresh
   process (fresh reader, wall clock restarted at zero — the hostile
   case for a time-based offset source) and the final table holds every
   event_id in [0, max] exactly once;
3. **rate limiting** — the offset high-water after T seconds is
   ~rate×T, not unbounded.
"""

from __future__ import annotations

import glob
import json
import os
import signal
import subprocess
import sys
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)

_PHASE = r"""
import glob, os, sys, time
sys.path.insert(0, %(repo)r)
from etl_cascalog_spark.session import get_spark
from etl_cascalog_spark.sources.synthetic import SyntheticEventsRateDataSource

spark = get_spark("rate_kill_phase")
spark.dataSource.register(SyntheticEventsRateDataSource)

def sink_commits():
    # the file sink's own commit log — what a later BATCH read honors
    return len(
        [p for p in glob.glob(os.path.join(%(out)r, "_spark_metadata", "*"))
         if os.path.basename(p).split(".")[0].isdigit()]
    )

start_commits = sink_commits()
q = (
    spark.readStream.format("synthetic_events_rate")
    .option("rows_per_second", 20000)
    .option("n_partitions", 4)
    .option("seed", 42)
    .load()
    .writeStream.format("parquet")
    .option("path", %(out)r)
    .option("checkpointLocation", %(ckpt)r)
    .start()
)
print("STREAM_STARTED", flush=True)
# run until at least min_commits NEW sink-log batches are durable (so a
# later batch read provably sees new data), hard deadline as backstop
deadline = time.time() + %(secs)d
while time.time() < deadline:
    if sink_commits() >= start_commits + %(min_commits)d:
        break
    time.sleep(0.5)
q.stop()
spark.stop()
print("PHASE_DONE", flush=True)
"""


def _spawn(
    out: str, ckpt: str, secs: int, min_commits: int = 3
) -> subprocess.Popen:
    return subprocess.Popen(
        [
            sys.executable,
            "-c",
            _PHASE
            % {
                "repo": REPO,
                "out": out,
                "ckpt": ckpt,
                "secs": secs,
                "min_commits": min_commits,
            },
        ],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
    )


def test_stream_rows_match_batch_reader(spark):
    """Replay determinism: the streaming rows for [0, N) equal the batch
    source's rows — same (seed, index) derivation, so ANY committed
    offset range replays bit-identically after a crash."""
    from etl_cascalog_spark.sources.synthetic import (
        SyntheticEventsDataSource,
        SyntheticEventsParallelStreamReader,
    )

    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SyntheticEventsDataSource)
    batch = (
        spark.read.format("synthetic_events")
        .option("n_rows", 5_000)
        .option("seed", 42)
        .load()
    )
    reader = SyntheticEventsParallelStreamReader({"seed": "42", "n_partitions": "4"})
    parts = reader.partitions({"index": 0}, {"index": 5_000})
    assert 1 < len(parts) <= 4  # genuinely partition-parallel
    got = sorted(row for p in parts for row in reader.read(p))
    want = sorted(tuple(r) for r in batch.collect())
    assert got == want


def test_rate_limit_bounds_offset_advance():
    from etl_cascalog_spark.sources.synthetic import (
        SyntheticEventsParallelStreamReader,
    )

    r = SyntheticEventsParallelStreamReader(
        {"rows_per_second": "1000", "max_batch_rows": "400"}
    )
    assert r.initialOffset() == {"index": 0}
    r.latestOffset()  # starts the clock
    time.sleep(1.0)
    got = r.latestOffset()["index"]
    # ~1000 allowed after 1s, but per-batch cap clamps to 400
    assert got <= 400
    got2 = r.latestOffset()["index"]
    assert got2 <= 800  # cap applies per call, budget still rate-bound


def test_backwards_range_after_restart_is_empty_and_ratchets():
    """The hostile restart shape: the checkpoint's committed offset
    outruns a fresh reader's wall clock. partitions(big, small) must
    yield NO partitions (never a backwards read) and ratchet the
    internal index so later batches resume PAST the committed point
    instead of re-delivering it."""
    from etl_cascalog_spark.sources.synthetic import (
        SyntheticEventsParallelStreamReader,
    )

    r = SyntheticEventsParallelStreamReader({"rows_per_second": "10"})
    assert r.partitions({"index": 50_000}, {"index": 3}) == []
    assert r.latestOffset()["index"] >= 50_000


def test_exactly_once_across_driver_sigkill(tmp_path):
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(out, exist_ok=True)

    def sink_commits():
        return len(
            [
                p
                for p in glob.glob(os.path.join(out, "_spark_metadata", "*"))
                if os.path.basename(p).split(".")[0].isdigit()
            ]
        )

    # phase A: stream, then SIGKILL once the SINK's commit log has
    # durable batches (a batch read honors _spark_metadata, not bare
    # part files) — mid-flight, no graceful stop, the checkpoint is all
    # phase B gets
    a = _spawn(out, ckpt, secs=120, min_commits=10_000)  # never self-stop
    try:
        deadline = time.time() + 150
        while time.time() < deadline:
            if sink_commits() >= 2 and glob.glob(
                os.path.join(ckpt, "commits", "*")
            ):
                break
            time.sleep(0.5)
        else:
            raise AssertionError("phase A produced no committed output in time")
    finally:
        a.send_signal(signal.SIGKILL)
        a.wait(timeout=30)
    committed_a = sink_commits()

    # phase B: fresh process, fresh wall clock, same checkpoint; runs
    # until the sink log shows NEW committed batches (load-robust), with
    # a generous wall backstop
    b = _spawn(out, ckpt, secs=120, min_commits=2)
    try:
        assert b.wait(timeout=240) == 0
    finally:
        if b.poll() is None:
            b.kill()
    assert sink_commits() > committed_a, "phase B committed nothing"

    # verify exactly-once contiguous coverage with a throwaway session
    verify = subprocess.run(
        [
            sys.executable,
            "-c",
            (
                "import sys; sys.path.insert(0, %r);"
                "from etl_cascalog_spark.session import get_spark;"
                "import json;"
                "spark = get_spark('rate_kill_verify');"
                "df = spark.read.parquet(%r);"
                "n = df.count();"
                "d = df.select('event_id').distinct().count();"
                "mx = df.agg({'event_id': 'max'}).collect()[0][0];"
                "print('VERDICT::' + json.dumps({'n': n, 'd': d, 'mx': mx}));"
                "spark.stop()"
            )
            % (REPO, out),
        ],
        capture_output=True,
        text=True,
        timeout=180,
    )
    assert verify.returncode == 0, verify.stderr[-2000:]
    line = [
        ln for ln in verify.stdout.splitlines() if ln.startswith("VERDICT::")
    ][-1]
    v = json.loads(line[len("VERDICT::"):])
    assert v["n"] > 0, "no rows survived the kill-resume cycle"
    assert v["n"] == v["d"], f"duplicates after driver kill: {v}"
    assert v["d"] == v["mx"] + 1, f"gaps after driver kill: {v}"
