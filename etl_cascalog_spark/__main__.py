"""Command-line entry point: list, run, or explain catalog queries.

Usage:
    python -m etl_cascalog_spark list
    python -m etl_cascalog_spark run pricing_summary [--sf DIR] [--limit N]
    python -m etl_cascalog_spark explain minhash_lsh_dedup [--sf DIR]
    python -m etl_cascalog_spark oracle pricing_summary

`run` prints the result (default 20 rows); `explain` prints the
AQE-final formatted physical plan after a noop execution (the plan you
would actually get, not the pre-adaptive sketch); `oracle` prints the
query's DuckDB oracle SQL. The reference shipped a shell script running
38 serial Hadoop jobs (cascalog.sh); this is its interactive
replacement.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="etl_cascalog_spark")
    sub = p.add_subparsers(dest="cmd", required=True)
    sub.add_parser("list", help="list catalog queries")
    for c in ("run", "explain", "oracle"):
        sp = sub.add_parser(c)
        sp.add_argument("query")
        if c != "oracle":
            sp.add_argument("--sf", default="/root/testdata/sf0.001")
        if c == "run":
            sp.add_argument("--limit", type=int, default=20)
    args = p.parse_args(argv)

    from etl_cascalog_spark.catalog import QUERIES

    if args.cmd == "list":
        for name in sorted(QUERIES):
            doc = (QUERIES[name].doc or "").split(". ")[0][:90]
            print(f"{name:32s} {doc}")
        return 0

    if args.query not in QUERIES:
        print(f"unknown query {args.query!r}; see `list`", file=sys.stderr)
        return 2
    spec = QUERIES[args.query]

    if args.cmd == "oracle":
        if spec.oracle is None:
            print("-- no oracle registered (rows-only check)")
        else:
            print(spec.oracle.strip())
        return 0

    from etl_cascalog_spark.session import get_spark

    spark = get_spark("etl_cascalog_spark_cli")
    # scope-bound storage: whatever the query caches/checkpoints dies when
    # the results have been consumed, even if getOrCreate handed us a
    # long-lived caller session (tests, notebooks); no spark.stop() for the
    # same reason — CLI processes tear the JVM down on exit anyway
    from etl_cascalog_spark.session import scoped_storage

    with scoped_storage(spark):
        df = spec.build(spark, args.sf)
        if args.cmd == "run":
            df.show(args.limit, truncate=False)
        else:
            df.write.format("noop").mode("overwrite").save()
            df.explain("formatted")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
