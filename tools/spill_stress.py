"""Measured spill evidence: the engine degrades to disk, not to OOM.

"Spill-aware" is a design claim until a run is actually forced past
executor memory. This harness runs one shuffle-heavy workload — a global
sort of ``--rows`` wide rows (default 30M x ~120 B = ~3.6 GB raw) written
to the ``noop`` sink so the sort fully executes — inside a JVM whose heap
is set by ``--mem``. Run it twice:

    python tools/spill_stress.py --mem 12g     # roomy: fits, zero spill
    python tools/spill_stress.py --mem 2500m   # constrained: must spill

and compare the JSON lines: the constrained run must COMPLETE (that is
the whole point — Spark's UnsafeExternalSorter trades memory pressure
for disk spill instead of dying) with ``disk_spill_mb > 0``, at a wall
penalty that SCALE.md records.

Spill counters come from the live UI REST API (`/api/v1/.../stages`),
summed over all stages — PySpark exposes no task-metrics API, so the
harness briefly enables the UI on an ephemeral port.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession, functions as F  # noqa: E402


def _get_json(url: str, tries: int = 5):
    last = None
    for _ in range(tries):
        try:
            return json.load(urllib.request.urlopen(url, timeout=30))
        except Exception as e:  # UI thread can lag under full-core load
            last = e
            time.sleep(2)
    raise last


def spill_totals(ui_url: str) -> dict:
    base = f"{ui_url.rstrip('/')}/api/v1/applications"
    apps = _get_json(base)
    app_id = apps[0]["id"]
    stages = _get_json(f"{base}/{app_id}/stages")
    return {
        "memory_spill_mb": round(
            sum(s.get("memoryBytesSpilled", 0) for s in stages) / 2**20, 1
        ),
        "disk_spill_mb": round(
            sum(s.get("diskBytesSpilled", 0) for s in stages) / 2**20, 1
        ),
        "failed_tasks": sum(s.get("numFailedTasks", 0) for s in stages),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=30_000_000)
    ap.add_argument("--mem", default="2500m")
    ap.add_argument("--ui-port", type=int, default=4057)
    args = ap.parse_args()

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.driver.memory", args.mem)
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(args.ui_port))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # ~120 B/row payload; sort key is a hash so the sort is genuinely
    # global (no presorted shortcut), the noop sink forces execution
    df = spark.range(args.rows).select(
        F.md5(F.col("id").cast("string")).alias("k"),
        F.concat(
            F.md5(F.col("id").cast("string")),
            F.md5((F.col("id") + 1).cast("string")),
            F.md5((F.col("id") + 2).cast("string")),
        ).alias("payload"),
    )
    t0 = time.monotonic()
    df.orderBy("k").write.format("noop").mode("overwrite").save()
    wall = time.monotonic() - t0

    out = {"rows": args.rows, "mem": args.mem, "wall_sec": round(wall, 2)}
    out.update(spill_totals(spark.sparkContext.uiWebUrl))
    out["completed"] = True
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
