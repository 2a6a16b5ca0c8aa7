"""Parallelism lint: find serialization points the PLAN cannot show.

The round-11 sf1 sweep exposed a defect class the plan-shape ratchet
(``tools/plan_pin.py``) and the static plan lint (``tests/test_plan_lint.py``)
are structurally blind to: a query whose plan is perfectly healthy — pushed
filters, broadcast dims, no cartesians — but whose HEAVY stage runs with
fewer tasks than the cluster has cores, because a join/groupBy key has tiny
cardinality or a single-file scan collapsed the probe side to one partition.
``fs_linkage_scores`` measured 372 s at sf1 with one task doing every
levenshtein; ``semantic_dedup_kmeans`` capped at k=8 tasks on 32 cores.

This tool measures instead of guessing: it runs every catalog query with the
Spark UI enabled, attributes completed stages to queries via job groups, and
flags any stage that is BOTH

- **near-serial**: ``numTasks < cpus / 4`` (the stage cannot use the
  machine), and
- **hot**: mean executor run time per task > ``--hot-ms`` (default 3000 ms —
  tiny single-task stages like limit-collects and metadata aggregates are
  expected and harmless).

Usage:
    python tools/parallelism_lint.py [--sf DIR] [--hot-ms N] [--only a,b]
        [--out PATH]

Writes a JSON artifact (default ``/tmp/PARALLELISM_LINT.json``) and prints
one summary line; exits 1 if any stage is flagged, so it can gate a sweep.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from etl_cascalog_spark.session import get_spark, scoped_storage  # noqa: E402


def _rest(base: str, path: str):
    with urllib.request.urlopen(f"{base}/api/v1{path}", timeout=10) as r:
        return json.load(r)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--hot-ms", type=int, default=3000)
    ap.add_argument("--only", default=None, help="comma-separated query names")
    ap.add_argument("--out", default="/tmp/PARALLELISM_LINT.json")
    args = ap.parse_args()

    spark = get_spark(
        "parallelism_lint", extra_conf={"spark.ui.enabled": "true"}
    )
    from etl_cascalog_spark.catalog import QUERIES  # noqa: E402

    names = sorted(QUERIES)
    if args.only:
        names = [n for n in args.only.split(",") if n in QUERIES]
    cpus = spark.sparkContext.defaultParallelism
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    # untimed warm-up so JIT isn't attributed to the first query
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    findings: dict[str, list[dict]] = {}
    per_query: dict[str, dict] = {}
    for name in names:
        sc = spark.sparkContext
        sc.setJobGroup(name, name)
        t0 = time.perf_counter()
        err = None
        try:
            with scoped_storage(spark):
                QUERIES[name].build(spark, args.sf).write.format("noop").mode(
                    "overwrite"
                ).save()
        except Exception as exc:  # keep sweeping; record the failure
            err = f"{type(exc).__name__}: {exc}"[:300]
        finally:
            sc.setJobGroup("", "")
        wall = round(time.perf_counter() - t0, 2)

        # attribute stages: jobs carry the job group; stages hang off jobs
        stage_ids = set()
        for job in _rest(ui, f"/applications/{app_id}/jobs?status=succeeded"):
            if job.get("jobGroup") == name:
                stage_ids.update(job.get("stageIds", []))
        flagged = []
        for st in _rest(ui, f"/applications/{app_id}/stages?status=complete"):
            if st["stageId"] not in stage_ids:
                continue
            n_tasks = st.get("numCompleteTasks") or st.get("numTasks") or 0
            run_ms = st.get("executorRunTime", 0)
            mean_ms = run_ms / max(n_tasks, 1)
            if n_tasks and n_tasks < cpus / 4 and mean_ms > args.hot_ms:
                flagged.append(
                    {
                        "stage": st["stageId"],
                        "n_tasks": n_tasks,
                        "mean_task_ms": round(mean_ms),
                        "total_run_ms": run_ms,
                        "name": (st.get("name") or "")[:120],
                    }
                )
        per_query[name] = {
            "wall_s": wall,
            "n_stages": len(stage_ids),
            "err": err,
        }
        if flagged:
            findings[name] = sorted(
                flagged, key=lambda f: -f["total_run_ms"]
            )
            print(f"# FLAG {name}: {findings[name]}", file=sys.stderr)
        else:
            print(f"# ok {name} ({wall}s)", file=sys.stderr)

    artifact = {
        "sf": args.sf,
        "cpus": cpus,
        "hot_ms": args.hot_ms,
        "n_queries": len(names),
        "n_flagged": len(findings),
        "findings": findings,
        "per_query": per_query,
    }
    Path(args.out).write_text(json.dumps(artifact, indent=1) + "\n")
    print(
        json.dumps(
            {
                "n_queries": len(names),
                "n_flagged": len(findings),
                "flagged": sorted(findings),
                "artifact": args.out,
            }
        )
    )
    spark.stop()
    return 1 if findings else 0


if __name__ == "__main__":
    raise SystemExit(main())
