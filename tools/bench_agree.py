"""Compare two bench.py JSON outputs for run-to-run agreement.

Round-4 verdict item 3's "Done" bar: two consecutive full-bench runs agree
within 10% on every query whose wall exceeds 1 s (sub-second queries carry
absolute noise bigger than their signal, so they are reported but not
gated). Usage:

    python tools/bench_agree.py RUN_A.json RUN_B.json [--tol 0.10]

Exits non-zero if any >1 s query disagrees beyond tolerance; prints a
sorted table of the worst ratios either way.
"""

from __future__ import annotations

import argparse
import json
import math
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("run_a")
    ap.add_argument("run_b")
    ap.add_argument("--tol", type=float, default=0.10)
    ap.add_argument("--floor", type=float, default=1.0, help="gate only queries >= this wall (s) in either run")
    args = ap.parse_args()

    da = json.load(open(args.run_a))
    db = json.load(open(args.run_b))
    # driver-recorded artifacts (BENCH_rN.json) wrap the bench.py line
    # under "parsed" — unwrap so local-vs-driver adjudication (VERDICT
    # r10 #4) is one command
    da = da.get("parsed", da)
    db = db.get("parsed", db)
    qa, qb = da["queries"], db["queries"]
    ma, mb = da.get("query_meta", {}), db.get("query_meta", {})

    def load_of(meta: dict, name: str) -> str:
        q = meta.get(name)
        return f"{q['loadavg']:.1f}" if q and q.get("loadavg") == q.get(
            "loadavg"
        ) else "-"

    for tag, d in (("A", da), ("B", db)):
        if "loadavg_start" in d:
            print(
                f"run {tag}: loadavg {d['loadavg_start']:.1f} -> "
                f"{d.get('loadavg_end', float('nan')):.1f}"
            )
    shared = sorted(set(qa) & set(qb))
    missing = sorted(set(qa) ^ set(qb))
    if missing:
        print(f"WARNING: {len(missing)} queries only in one run: {missing}", file=sys.stderr)

    rows = []
    for name in shared:
        a, b = qa[name], qb[name]
        ratio = max(a, b) / max(min(a, b), 1e-9)
        gated = max(a, b) >= args.floor
        rows.append((ratio, name, a, b, gated))
    rows.sort(reverse=True)

    fails = [(r, n, a, b) for r, n, a, b, g in rows if g and r > 1 + args.tol]
    gated_n = sum(1 for *_, g in rows if g)
    logs = [math.log(qb[n] / qa[n]) for n in shared if min(qa[n], qb[n]) > 0]
    geomean = math.exp(sum(logs) / len(logs)) if logs else float("nan")

    print(f"shared={len(shared)} gated(>= {args.floor}s)={gated_n} "
          f"geomean(B/A)={geomean:.3f} tol={args.tol:.0%}")
    print("worst 12 ratios (ratio, query, A, B, loadA, loadB, gated):")
    for r, n, a, b, g in rows[:12]:
        print(
            f"  {r:5.2f}  {n:<35s} {a:6.2f} {b:6.2f} "
            f"{load_of(ma, n):>5s} {load_of(mb, n):>5s} {'GATED' if g else ''}"
        )
    if fails:
        print(f"FAIL: {len(fails)} gated queries beyond {args.tol:.0%}:")
        for r, n, a, b in fails:
            print(
                f"  {r:5.2f}  {n:<35s} {a:6.2f} {b:6.2f} "
                f"{load_of(ma, n):>5s} {load_of(mb, n):>5s}"
            )
        return 1
    print(f"OK: all {gated_n} gated queries within {args.tol:.0%}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
