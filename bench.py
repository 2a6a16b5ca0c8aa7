"""Benchmark harness: runs the headline catalog queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``value`` is the total wall-clock over all headline queries. Each query is
driven through the ``noop`` sink (full evaluation of every output column —
a bare ``count()`` would let Catalyst prune unreferenced projection
expressions and understate projection-only queries); row counts come from an
``Observation`` on the same job, so nothing runs twice.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from etl_cascalog_spark.session import (  # noqa: E402
    get_spark,
    release_all_blocks,
    scoped_storage,
)
from etl_cascalog_spark.catalog import QUERIES  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark("etl_cascalog_spark_bench")

    # untimed warm-up: JVM/JIT + parquet footer caches, not query work
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from etl_cascalog_spark.io import read_table

    read_table(spark, sf_dir, "lineitem").limit(1).collect()
    # one tiny catalog query untimed, so whole-stage-codegen JIT of the
    # common operator stack is not billed to whichever query sorts first
    with scoped_storage(spark):
        QUERIES["static_report"].build(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    run_seq = [0]

    def run_once(name: str) -> float:
        t0 = time.perf_counter()
        # queries are independent jobs (the reference ran each report in its
        # own JVM): every cache / localCheckpoint block a query creates dies
        # at scope exit — the round-2 lesson (leaked blocks -> deterministic
        # major-GC stall mid-sweep) made structural instead of conventional.
        with scoped_storage(spark):
            df = QUERIES[name].build(spark, sf_dir)
            run_seq[0] += 1
            obs = Observation(f"rows_{name}_{run_seq[0]}")
            df.observe(obs, F.count(F.lit(1)).alias("n")).write.format(
                "noop"
            ).mode("overwrite").save()
            n = obs.get["n"]
        wall = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {wall:.3f}s ({n} rows)", file=sys.stderr)
        return wall

    timings: dict[str, float] = {}
    for name in sorted(QUERIES):
        timings[name] = run_once(name)

    # Median-of-3 for the heavy tail: on a co-tenant host single samples of
    # the longest queries swing 2x (GC pause, page-cache eviction, noisy
    # neighbor) — exactly the queries whose round-over-round ratios the
    # comparison weighs most. Re-run the top-10 by first-pass wall twice
    # more and record the per-query MEDIAN; sub-second queries keep their
    # single sample (their absolute noise is irrelevant to the total).
    heavy = sorted(timings, key=timings.get, reverse=True)[:10]
    for name in heavy:
        samples = [timings[name], run_once(name), run_once(name)]
        timings[name] = sorted(samples)[1]
        print(f"# {name}: median {timings[name]:.3f}s of {samples}", file=sys.stderr)

    release_all_blocks(spark)  # sweep epilogue: also clears SQL-cache metadata
    total = round(sum(timings.values()), 3)
    line = json.dumps(
        {
            "metric": "catalog_total_wall",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "sf": float(sf),
        }
    )
    # the driver parses stdout (and truncated it in round 2): emit exactly
    # one JSON line there, AND persist the same JSON to a file so the
    # artifact survives any pipe truncation
    Path(__file__).resolve().parent.joinpath("BENCH_local.json").write_text(
        line + "\n"
    )
    sys.stdout.write(line + "\n")
    sys.stdout.flush()
    spark.stop()


if __name__ == "__main__":
    main()
