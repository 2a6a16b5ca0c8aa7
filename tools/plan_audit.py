"""Regenerate SCALE.md's full-catalog physical-plan audit table.

Counts operator nodes in the *executed* (AQE-final) plan of every catalog
query at the given SF dir. Caches and broadcast-reuse make naive substring
counts lie: a plan string reprints an InMemoryRelation's cached subtree at
every scan site, so the same Exchange can appear N times. Counting UNIQUE
plan lines (stripped of tree-drawing prefixes) dedupes reprints — identical
node → identical line (same expr ids) — while genuinely distinct nodes
differ. ReusedExchange prints as its own node name, so reuse is never
double-counted as a shuffle.

Usage: python tools/plan_audit.py [sf_dir] [--only a,b] > /tmp/audit.md

``--only`` restricts to named queries — the sf1 BuildJobs measurement
(VERDICT r11 #2) audits just the (b)-class EAGER_BUILD_OK recurrences
there; a full-catalog execution pass at sf1 buys nothing extra for that
question. The R5/budget gates still apply to whatever ran.
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

PREFIX = re.compile(r"^[\s:+*()\-\d]*")


def audit_plan(plan: str) -> dict[str, int | str]:
    uniq = {PREFIX.sub("", ln).strip() for ln in plan.splitlines()}
    uniq = {ln for ln in uniq if ln}

    def n(pat: str) -> int:
        rx = re.compile(pat)
        return sum(1 for ln in uniq if rx.match(ln))

    return {
        "smj": n(r"SortMergeJoin"),
        "bhj": n(r"BroadcastHashJoin"),
        "bnlj": n(r"BroadcastNestedLoopJoin"),
        "cart": n(r"CartesianProduct"),
        "exch": n(r"Exchange (hash|range)partitioning|Exchange SinglePartition"),
        "push": "yes"
        if any(re.search(r"PushedFilters: \[[^\]]", ln) for ln in uniq)
        else "-",
    }


def main() -> None:
    args = [a for a in sys.argv[1:]]
    only: set[str] | None = None
    if "--only" in args:
        i = args.index("--only")
        if i + 1 >= len(args):
            sys.exit("plan_audit: --only requires a comma-separated list")
        only = {n for n in args[i + 1].split(",") if n}
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    from etl_cascalog_spark.catalog import QUERIES

    if only is not None:
        unknown = only - set(QUERIES)
        if unknown:
            # fail LOUD (review r12): silently dropping a typo would
            # record a clean audit for a query that was never measured
            sys.exit(f"plan_audit: unknown queries in --only: {sorted(unknown)}")
    from etl_cascalog_spark.io import TABLES, read_table
    from etl_cascalog_spark.plans.lint import EAGER_BUILD_OK, count_build_jobs
    from etl_cascalog_spark.session import get_spark, release_all_blocks

    spark = get_spark("plan_audit")
    # warm the per-path schema cache so the one-time parquet footer read is
    # not charged to any query's build (a production catalog carries the
    # schema; the footer job is a local-mode artifact)
    for t in TABLES:
        read_table(spark, sf_dir, t)
    violations: dict[str, int] = {}
    over_budget: dict[str, tuple[int, int]] = {}
    names = sorted(QUERIES) if only is None else sorted(only & set(QUERIES))
    # the lazy-now hygiene note only means something on a FULL sweep
    stale_whitelist = set(EAGER_BUILD_OK) if only is None else set()
    print("| query | SMJ | BHJ | BNLJ | Cart | Exch | Push | BuildJobs |")
    print("|---|---|---|---|---|---|---|---|")
    for name in names:
        df, n_jobs = count_build_jobs(
            spark, lambda: QUERIES[name].build(spark, sf_dir), name
        )
        jobs_cell = str(n_jobs)
        if n_jobs:
            if name in EAGER_BUILD_OK:
                stale_whitelist.discard(name)
                budget = EAGER_BUILD_OK[name][0]
                jobs_cell = f"{n_jobs}/{budget}"
                if n_jobs > budget:
                    over_budget[name] = (n_jobs, budget)
            else:
                violations[name] = n_jobs
        df.write.format("noop").mode("overwrite").save()
        plan = df._jdf.queryExecution().executedPlan().toString()
        a = audit_plan(plan)
        print(
            f"| {name} | {a['smj']} | {a['bhj']} | {a['bnlj']} | {a['cart']} "
            f"| {a['exch']} | {a['push']} | {jobs_cell} |"
        )
        sys.stdout.flush()
        # full storage reset (incl. localCheckpoint blocks from iterative
        # builders) — clearCache alone leaks those across a 131-query sweep
        release_all_blocks(spark)
    spark.stop()
    if violations:
        print(
            f"\nR5 VIOLATION — eager jobs at plan-build time: {violations} "
            "(see plans/lint.py EAGER_BUILD_OK for the contract)",
            file=sys.stderr,
        )
        sys.exit(1)
    if over_budget:
        print(
            "\nR5 BUDGET VIOLATION — whitelisted builds exceeded their "
            f"max_jobs contract (actual, budget): {over_budget} "
            "(see plans/lint.py EAGER_BUILD_OK)",
            file=sys.stderr,
        )
        sys.exit(1)
    # names that stayed whitelisted but no longer submit build jobs would
    # let the whitelist rot into a loophole — flag, don't fail (a faster
    # build is not a defect)
    lazy_now = stale_whitelist
    if lazy_now:
        print(
            f"\nnote: EAGER_BUILD_OK entries now lazy (prune them): "
            f"{sorted(lazy_now)}",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
