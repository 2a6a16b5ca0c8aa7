"""Streaming state soak (VERDICT r6 #7): high-volume evidence that

1. **session state PLATEAUS under watermark eviction** — a rate source
   pushes >=10^7 events through :func:`streaming.windows.sessions`; the
   state-store row count (``stateOperators[0].numRowsTotal``) is sampled
   per progress tick and must flatten (late-phase max within 1.25x of
   mid-phase max) while rows REMOVED stays > 0 — i.e. state is bounded by
   the watermark, not by stream length;
2. **HLL register state stays O(groups)** — the same feed through
   ``applyInPandasWithState`` register state: state rows == group count
   forever, regardless of event volume;
3. **the exactly-once JDBC sink survives a MID-SOAK kill + replay** — a
   rate stream upserts into embedded Derby via
   ``idempotent_jdbc_upsert_sink``; the query is stopped mid-flight, the
   last ledger marker removed (the post-effect-pre-marker crash), and the
   stream restarted from the same checkpoint. Invariant: one row per key
   (double-apply would duplicate), value consistent with its key.

Durations are tuned so the default run pushes ~1.2x10^7 session events in
~2 minutes on local[32]; numbers land in stdout JSON for SCALE.md.

Usage: python tools/streaming_soak.py [--rate 100000] [--secs 120]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from etl_cascalog_spark.session import get_spark  # noqa: E402


def rate_stream(spark, rows_per_sec: int):
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_sec)
        .option("numPartitions", 8)
        .load()
    )


def soak_sessions(spark, rows_per_sec: int, secs: int) -> dict:
    """Rate -> session windows (5s gap, 15s watermark) over a user space
    sparse enough that sessions CLOSE (inter-arrival per user ~20s > gap).
    State must plateau at ~(users active inside gap+watermark), not grow
    with total events."""
    from etl_cascalog_spark.streaming.windows import sessions

    users = rows_per_sec * 20  # ~1 event / user / 20s
    events = rate_stream(spark, rows_per_sec).select(
        F.col("timestamp").alias("ts"),
        (F.col("value") % users).alias("user_id"),
    )
    out = sessions(events, gap="5 seconds", watermark="15 seconds")
    q = (
        out.writeStream.outputMode("append")
        .format("noop")
        .option(
            "checkpointLocation",
            tempfile.mkdtemp(prefix="soak_sessions_ckpt_"),
        )
        .start()
    )
    samples: list[dict] = []
    t0 = time.time()
    last_batch = -1
    total_in = 0
    target = rows_per_sec * secs
    try:
        while total_in < target and time.time() - t0 < 3 * secs:
            time.sleep(2)
            # drain recentProgress (deduped by batchId) rather than sampling
            # lastProgress: batches that complete between polls are still
            # counted, so total_in reflects true throughput (ADVICE r7)
            for p in q.recentProgress:
                if not p or p["batchId"] <= last_batch:
                    continue
                last_batch = p["batchId"]
                total_in += p["numInputRows"]
                if not p.get("stateOperators"):
                    continue
                so = p["stateOperators"][0]
                samples.append(
                    {
                        "t": round(time.time() - t0, 1),
                        "input_rows": p["numInputRows"],
                        "state_rows": so["numRowsTotal"],
                        "rows_removed": so.get("numRowsRemoved", 0),
                    }
                )
    finally:
        q.stop()
    removed = sum(s["rows_removed"] for s in samples)
    # judge the plateau only AFTER eviction starts: the ramp before the
    # first watermark catch-up grows linearly by design
    evicting = [i for i, s in enumerate(samples) if s["rows_removed"] > 0]
    mid: list[int] = []
    late: list[int] = []
    if evicting:
        post = [s["state_rows"] for s in samples[evicting[0] :]]
        n = len(post)
        mid, late = post[: max(n // 2, 1)], post[n // 2 :]
    plateau = bool(mid and late and max(late) <= 1.25 * max(mid))
    return {
        "events": total_in,
        "state_rows_mid_max": max(mid) if mid else None,
        "state_rows_late_max": max(late) if late else None,
        "rows_removed": removed,
        "plateau": plateau,
        "evicting": removed > 0,
        "samples": samples[-6:],
    }


def soak_hll(spark, rows_per_sec: int, secs: int) -> dict:
    """Rate -> per-event-type HLL register state: state rows must equal
    the GROUP count (8) no matter how many events flow through."""
    from etl_cascalog_spark.streaming.sketch_state import (
        running_distinct_users_hll,
    )

    events = rate_stream(spark, rows_per_sec).select(
        F.concat(F.lit("type_"), (F.col("value") % 8).cast("string")).alias(
            "event_type"
        ),
        (F.col("value") % 3_000_000).alias("user_id"),
    )
    out = running_distinct_users_hll(events)
    q = (
        out.writeStream.outputMode("update")
        .format("noop")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="soak_hll_ckpt_"))
        .start()
    )
    state_rows, total_in = [], 0
    t0 = time.time()
    last_batch = -1
    target = rows_per_sec * secs
    try:
        while total_in < target and time.time() - t0 < 4 * secs:
            time.sleep(2)
            # drain recentProgress so batches completing between polls count
            for p in q.recentProgress:
                if not p or p["batchId"] <= last_batch:
                    continue
                last_batch = p["batchId"]
                total_in += p["numInputRows"]
                if p.get("stateOperators"):
                    state_rows.append(p["stateOperators"][0]["numRowsTotal"])
    finally:
        q.stop()
    return {
        "events": total_in,
        "state_rows_max": max(state_rows) if state_rows else None,
        "state_bounded_by_groups": bool(state_rows) and max(state_rows) <= 8,
    }


def soak_jdbc_kill_replay(spark, rows_per_sec: int, secs: int) -> dict:
    """Rate -> idempotent Derby upsert; kill mid-soak, remove the newest
    ledger marker (post-effect-pre-marker crash), restart from the same
    checkpoint, run on. Exactly-once invariant: one row per key, value
    congruent to its key."""
    from etl_cascalog_spark.io import jdbc_execute, jdbc_read
    from etl_cascalog_spark.streaming.sinks import idempotent_jdbc_upsert_sink

    url = "jdbc:derby:memory:etl_soak_upsert;create=true"
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    jdbc_execute(spark, url, "CREATE TABLE kv (k BIGINT NOT NULL, v BIGINT)")
    ledger = tempfile.mkdtemp(prefix="soak_ledger_")
    ckpt = tempfile.mkdtemp(prefix="soak_jdbc_ckpt_")
    n_keys = 1000
    sink = idempotent_jdbc_upsert_sink(url, "kv", ["k"], ledger, props)

    def start():
        events = rate_stream(spark, rows_per_sec).select(
            (F.col("value") % n_keys).alias("k"), F.col("value").alias("v")
        )
        return (
            events.writeStream.foreachBatch(
                lambda df, bid: sink(
                    # keep ONE row per key within the batch (latest value)
                    df.groupBy("k").agg(F.max("v").alias("v")),
                    bid,
                )
            )
            .option("checkpointLocation", ckpt)
            .start()
        )

    def run_until_rows(q, min_rows: int, timeout: float) -> int:
        """Let the stream run until >= min_rows input rows committed (so
        the kill/replay is never vacuous), then return the count."""
        seen, t0, last = 0, time.time(), -1
        while seen < min_rows and time.time() - t0 < timeout:
            time.sleep(1)
            for p in q.recentProgress:
                if p and p["batchId"] > last:
                    last = p["batchId"]
                    seen += p["numInputRows"]
        return seen

    q = start()
    rows_first = run_until_rows(q, rows_per_sec * secs // 2, 4 * secs)
    q.stop()  # mid-soak kill
    # Deterministic crash simulation: Spark's checkpoint commit is the
    # LAST step of a micro-batch, so "crash after the DB effect, before
    # anything durable" = newest commits/<N> record missing. Removing it
    # forces re-delivery of batch N on restart; removing batch N's ledger
    # marker too steers the re-delivery down the delete-then-append
    # healing path (not the marker short-circuit).
    commits = [
        p
        for p in glob.glob(os.path.join(ckpt, "commits", "*"))
        if os.path.basename(p).isdigit()
    ]
    replayed = None
    if commits:
        newest = max(commits, key=lambda p: int(os.path.basename(p)))
        bid = int(os.path.basename(newest))
        os.remove(newest)
        # the Hadoop checksum SIDECAR must go too: a leftover .N.crc makes
        # the restarted query crash renaming the re-written commit record
        crc = os.path.join(os.path.dirname(newest), f".{bid}.crc")
        if os.path.exists(crc):
            os.remove(crc)
        marker = os.path.join(ledger, f"batch-{bid}.committed")
        if os.path.exists(marker):
            os.remove(marker)
        replayed = bid
    q = start()  # restart from the same checkpoint -> re-delivery
    rows_second = run_until_rows(q, rows_per_sec * secs // 4, 4 * secs)
    err = q.exception()
    q.stop()

    rows = jdbc_read(spark, url, "kv", props).collect()
    keys = [r[0] for r in rows]
    one_row_per_key = len(keys) == len(set(keys))
    congruent = all(r[1] % n_keys == r[0] for r in rows)
    return {
        "rows_first_half": rows_first,
        "rows_second_half": rows_second,
        "keys_seen": len(set(keys)),
        "table_rows": len(rows),
        "one_row_per_key": one_row_per_key and len(keys) == n_keys,
        "values_congruent": congruent,
        "marker_removed_for_replay": replayed is not None,
        "restart_error": str(err) if err else None,
    }


def soak_offset_resume(spark, rows_per_sec: int, secs: int) -> dict:
    """The broker-shaped source at soak volume (VERDICT r8 #6): the
    rate-limited offset-based reader (``synthetic_events_rate``,
    sources/synthetic.py — Kafka-shaped offsets, executor-side reads,
    deterministic replay) streams into a parquet file sink, is STOPPED
    mid-flight, resumed from the same checkpoint (fresh reader instance,
    wall clock restarted — the hostile offset shape), and run on.
    Invariant: event_id coverage is exactly-once AND gap-free across the
    stop/resume boundary. The harsher driver-SIGKILL variant of the same
    invariant lives in tests/test_rate_source.py; this leg proves it at
    soak volume."""
    from etl_cascalog_spark.sources.synthetic import (
        SyntheticEventsRateDataSource,
    )

    spark.dataSource.register(SyntheticEventsRateDataSource)
    out = tempfile.mkdtemp(prefix="soak_rate_out_")
    ckpt = tempfile.mkdtemp(prefix="soak_rate_ckpt_")

    def start():
        return (
            spark.readStream.format("synthetic_events_rate")
            .option("rows_per_second", rows_per_sec)
            .option("n_partitions", 8)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .start()
        )

    q = start()
    time.sleep(max(secs // 2, 10))
    q.stop()  # mid-flight: the last batch may be half-written
    df1 = spark.read.parquet(out)
    rows_first = df1.count()
    q = start()  # fresh reader: offsets resume from the checkpoint
    time.sleep(max(secs // 2, 10))
    err = q.exception()
    q.stop()

    df = spark.read.parquet(out)
    n = df.count()
    d = df.select("event_id").distinct().count()
    mx = df.agg(F.max("event_id")).collect()[0][0]
    return {
        "rows_first_half": rows_first,
        "rows_total": n,
        "distinct_ids": d,
        "max_id": mx,
        "resumed_past_first_half": n > rows_first > 0,
        "exactly_once": n == d,
        "gap_free": mx is not None and d == mx + 1,
        "restart_error": str(err) if err else None,
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rate", type=int, default=100_000)
    ap.add_argument("--secs", type=int, default=120)
    args = ap.parse_args()
    spark = get_spark("streaming_soak")
    spark.conf.set("spark.sql.shuffle.partitions", "32")

    res = {
        "sessions": soak_sessions(spark, args.rate, args.secs),
        "hll": soak_hll(spark, max(args.rate // 2, 1), max(args.secs // 2, 20)),
        "jdbc": soak_jdbc_kill_replay(spark, 5_000, max(args.secs // 3, 30)),
        "offset_resume": soak_offset_resume(
            spark, args.rate, max(args.secs // 3, 20)
        ),
    }
    ok = (
        res["sessions"]["plateau"]
        and res["sessions"]["evicting"]
        and res["hll"]["state_bounded_by_groups"]
        and res["jdbc"]["one_row_per_key"]
        and res["jdbc"]["values_congruent"]
        and res["jdbc"]["marker_removed_for_replay"]
        and res["jdbc"]["restart_error"] is None
        and res["offset_resume"]["resumed_past_first_half"]
        and res["offset_resume"]["exactly_once"]
        and res["offset_resume"]["gap_free"]
        and res["offset_resume"]["restart_error"] is None
    )
    res["ok"] = ok
    print(json.dumps(res))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
