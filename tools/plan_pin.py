"""Generate / check ``PLAN_PINS.json`` — the catalog's plan-shape ratchet.

``plans/lint.py`` enforces the three structural invariants (no cartesian,
no unbounded global window, no dim-side SMJ); this pins the *quantitative*
shape of every query's static physical plan — shuffle-exchange count,
broadcast count, join-strategy mix — so a future edit that silently adds a
shuffle, drops a broadcast hint, or lets a BHJ degrade to SortMergeJoin
fails ``tests/test_plan_lint.py::test_plan_fingerprints_match_pins``
until the new shape is reviewed and re-pinned here.

Counts come from walking the static plan TREE (AQE off), not the plan
string: cached subtrees end at their InMemoryTableScan and ReusedExchange
is its own node class, so reprints never inflate the numbers.

Usage:
    python tools/plan_pin.py            # diff current plans vs the pins
    python tools/plan_pin.py --write    # rewrite PLAN_PINS.json

Exit code 0 iff every fingerprint matches the committed pin.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from etl_cascalog_spark.catalog import QUERIES  # noqa: E402
from etl_cascalog_spark.plans.lint import lint_plan  # noqa: E402
from etl_cascalog_spark.session import get_spark, release_all_blocks  # noqa: E402

PINS_PATH = Path(__file__).resolve().parent.parent / "PLAN_PINS.json"


def collect_fingerprints(spark, sf_dir: str) -> dict[str, dict[str, int]]:
    prior = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    out: dict[str, dict[str, int]] = {}
    try:
        for name in sorted(QUERIES):
            out[name] = lint_plan(QUERIES[name].build(spark, sf_dir)).fingerprint()
            release_all_blocks(spark)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prior)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--write", action="store_true")
    args = ap.parse_args()

    spark = get_spark("plan_pin")
    got = collect_fingerprints(spark, args.sf)

    if args.write:
        PINS_PATH.write_text(json.dumps(got, indent=1, sort_keys=True) + "\n")
        print(f"wrote {len(got)} pins to {PINS_PATH}")
        return 0

    want = json.loads(PINS_PATH.read_text()) if PINS_PATH.exists() else {}
    bad = 0
    for name in sorted(set(got) | set(want)):
        if got.get(name) != want.get(name):
            bad += 1
            print(f"DIFF {name}: pinned={want.get(name)} current={got.get(name)}")
    print(f"{len(got)} queries, {bad} fingerprint diffs")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
