"""Isolated A/B bench for a named query subset — bench.py's exact
methodology (noop sink, Observation row count, scoped_storage lifecycle,
pre-query GC, min-of-N with adaptive escalation) over just the queries an
optimization touches, so a change is measured without paying a full
198-query sweep per iteration.

Usage:
    python tools/bench_subset.py --repo /root/repo --sf /root/testdata/sf0.1 \
        [--samples 5] [--out /tmp/subset.json] neardup_clusters dedup_cluster_sizes

``--repo`` points at the source tree to import (a git worktree of an older
commit gives the BEFORE measurement). Prints one JSON line mapping query ->
min seconds; per-sample detail goes to stderr.

This tool never touches BENCH_local.json or the driver contract — it is a
measurement instrument for OPTIMIZATION_r*.md evidence only.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repo", default=str(Path(__file__).resolve().parent.parent))
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--samples", type=int, default=5)
    ap.add_argument("--out", default=None)
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    sys.path.insert(0, args.repo)
    from etl_cascalog_spark.session import (
        get_spark,
        release_all_blocks,
        scoped_storage,
    )
    from etl_cascalog_spark.catalog import QUERIES
    from etl_cascalog_spark.io import read_table

    unknown = [q for q in args.queries if q not in QUERIES]
    if unknown:
        sys.exit(f"bench_subset: unknown queries {unknown}")

    spark = get_spark("bench_subset")
    # same untimed warm-up as bench.py: JVM/JIT + parquet footer caches
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    read_table(spark, args.sf, "lineitem").limit(1).collect()
    with scoped_storage(spark):
        QUERIES["static_report"].build(spark, args.sf).write.format(
            "noop"
        ).mode("overwrite").save()

    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    seq = [0]

    def run_once(name: str) -> float:
        t0 = time.perf_counter()
        with scoped_storage(spark):
            df = QUERIES[name].build(spark, args.sf)
            seq[0] += 1
            obs = Observation(f"rows_{name}_{seq[0]}")
            df.observe(obs, F.count(F.lit(1)).alias("n")).write.format(
                "noop"
            ).mode("overwrite").save()
            obs.get["n"]
        wall = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {wall:.3f}s", file=sys.stderr)
        return wall

    jvm_system = spark._jvm.java.lang.System  # noqa: SLF001
    timings: dict[str, float] = {}
    detail: dict[str, list[float]] = {}
    for name in args.queries:
        jvm_system.gc()
        samples = [run_once(name) for _ in range(args.samples)]
        if max(samples) / max(min(samples), 1e-9) > 1.25:
            samples += [run_once(name), run_once(name)]
        timings[name] = min(samples)
        detail[name] = samples
        print(f"# {name}: min {timings[name]:.3f}s of {samples}", file=sys.stderr)

    release_all_blocks(spark)
    line = json.dumps({"sf": args.sf, "queries": timings, "samples": detail})
    if args.out:
        Path(args.out).write_text(line + "\n")
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
