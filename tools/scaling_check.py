"""Scaling evidence: run headline operators at sf0.001 / sf0.01 / sf0.1 and
report wall-clock growth vs data growth.

A shuffle-clean operator should scale ~linearly in rows (10x data -> ~10x
work, and on local[32] well under 10x wall while cores are idle); a
quadratic or driver-bound operator shows super-linear growth here long
before it kills a 100 TB run. The headline set covers each family's
cost center: LSH near-dedup + star CC, SimHash banding, curation E2E,
packing prefix sums, IVF ANN, substring spans, PageRank iterations, and
the flagship grouped aggregate.

Usage: python tools/scaling_check.py  -> one JSON line + a table on stderr
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from etl_cascalog_spark.session import get_spark, scoped_storage  # noqa: E402
from etl_cascalog_spark.catalog import QUERIES  # noqa: E402

HEADLINE = [
    "pricing_summary",
    "neardup_clusters",
    "simhash_dedup",
    "corpus_curation_pipeline",
    "sequence_packing_offsets",
    "ann_ivf_topk",
    "substring_dup_spans",
    "pagerank_copurchase",
]

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def main() -> None:
    spark = get_spark("scaling_check")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JIT warm-up
    out: dict[str, dict[str, float]] = {}
    for name in HEADLINE:
        out[name] = {}
        for sf in SFS:
            t0 = time.perf_counter()
            with scoped_storage(spark):
                QUERIES[name].build(spark, sf).write.format("noop").mode(
                    "overwrite"
                ).save()
            out[name][sf.rsplit("sf", 1)[-1]] = round(time.perf_counter() - t0, 3)
    print(f"{'query':32s} {'sf.001':>8s} {'sf.01':>8s} {'sf.1':>8s} "
          f"{'x(.01/.001)':>12s} {'x(.1/.01)':>10s}", file=sys.stderr)
    for name, t in out.items():
        r1 = t["0.01"] / max(t["0.001"], 1e-9)
        r2 = t["0.1"] / max(t["0.01"], 1e-9)
        print(f"{name:32s} {t['0.001']:8.2f} {t['0.01']:8.2f} {t['0.1']:8.2f} "
              f"{r1:12.2f} {r2:10.2f}", file=sys.stderr)
    sys.stdout.write(json.dumps({"scaling": out}) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
