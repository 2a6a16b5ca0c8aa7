"""Measure the repeated-pivot fusion (SURVEY §4.2/§7 deferred item).

The 5 sliding trgx reports share an IDENTICAL comparison pass (same dims,
same spine, same source — ``_TRGX_DIMS`` is fixed by the score tap). The
reference ran each as its own serial Hadoop job, re-running scan + pivot
per job (cascalog.sh:37-119). This tool times the family both ways at a
given SF dir:

  separate — build_reference_report per name (pivot per report);
  shared   — build_trgx_reports_shared (one cached pivot, N tails).

Usage: python tools/pivot_fusion_bench.py [sf_dir] [rounds]
Prints one JSON line; paste the numbers into SCALE.md either way
(the deferral becomes evidence, positive or negative).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from etl_cascalog_spark.session import get_spark, scoped_storage  # noqa: E402

FAMILY = [
    "score_period",
    "score_period_months",
    "score_bottler_ranking",
    "score_opportunity",
    "score_channel_metrics_opportunity",
]
SPINE = ("1996-01-01", "1997-12-31")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from etl_cascalog_spark.catalog import _TRGX_REPORT_SKELETON, trgx_score_frame
    from etl_cascalog_spark.plans.reports_registry import (
        build_reference_report,
        build_trgx_reports_shared,
    )

    import copy

    # the catalog skeleton carries only the CHANNELS branch (merge-mode
    # reports); the kpi-mode family members need a CODE branch too — reuse
    # the Total channel's children as the KPI subtree (same node shape)
    skeleton = copy.deepcopy(_TRGX_REPORT_SKELETON)
    root = skeleton["全体-Total / 所有渠道"]
    root["BRANCH"]["CODE"] = copy.deepcopy(
        root["BRANCH"]["CHANNELS"]["全体-Total / 所有渠道"].get("CHILDREN", {})
    )

    spark = get_spark("pivot_fusion_bench")
    frame = trgx_score_frame(spark, sf_dir)

    def evaluate(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    # untimed warm-up of both paths (JIT + parquet footers)
    with scoped_storage(spark):
        evaluate(
            build_reference_report(
                spark, FAMILY[0], frame, SPINE, skeleton=skeleton
            )
        )

    separate, shared = [], []
    for _ in range(rounds):
        t0 = time.perf_counter()
        with scoped_storage(spark):
            for name in FAMILY:
                evaluate(
                    build_reference_report(
                        spark, name, frame, SPINE, skeleton=skeleton
                    )
                )
        separate.append(round(time.perf_counter() - t0, 3))

        t0 = time.perf_counter()
        with scoped_storage(spark):
            reports = build_trgx_reports_shared(
                spark, frame, FAMILY, SPINE, skeleton
            )
            for df in reports.values():
                evaluate(df)
        shared.append(round(time.perf_counter() - t0, 3))

    med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "family": FAMILY,
                "rounds": rounds,
                "separate_sec": separate,
                "shared_sec": shared,
                "separate_median": med(separate),
                "shared_median": med(shared),
                "speedup": round(med(separate) / med(shared), 3),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
