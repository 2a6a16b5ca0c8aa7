"""Merge the sf1 evidence into ONE driver-format artifact (VERDICT r6 #1
"Done" bar: CORRECTNESS_local_sf1.json with a row for EVERY catalog query,
hash-oracled verbatim for all but the remaining exact-witness handful in
tools/sf1_oracle.py HEAVY).

Inputs:
  - the affordable-subset sweep (tools/correctness_local.py --only ... at
    sf1) — hash-oracled rows in driver format;
  - the heavy harness output (tools/sf1_oracle.py) — same row shape plus
    spark_sec/oracle_sec, wrapped under "results" with the shared-
    materialization timings.

The merge asserts the union covers the whole catalog exactly once, tags
each row with its evidence tier ("oracle" = catalog oracle verbatim,
"exact-witness" = fixpoint-CC / banded / numpy twin from sf1_oracle.py),
and writes the combined artifact.

Usage: python tools/sf1_merge.py SUBSET.json HEAVY.json [--out PATH]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from etl_cascalog_spark.catalog import QUERIES  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("subset_json")
    ap.add_argument("heavy_json")
    ap.add_argument(
        "--out",
        default=str(
            Path(__file__).resolve().parent.parent / "CORRECTNESS_local_sf1.json"
        ),
    )
    ap.add_argument(
        "--note",
        default=None,
        help="round note recorded as note_<tag> in the artifact, e.g. "
        "--note 'r11: ...'",
    )
    args = ap.parse_args()
    subset = json.load(open(args.subset_json))
    heavy_doc = json.load(open(args.heavy_json))
    heavy = heavy_doc["results"]

    overlap = set(subset) & set(heavy)
    assert not overlap, f"queries in both inputs: {sorted(overlap)}"
    merged: dict[str, dict] = {}
    for name, row in subset.items():
        merged[name] = dict(row, evidence="oracle")
    for name, row in heavy.items():
        merged[name] = dict(row, evidence="exact-witness")
    missing = sorted(set(QUERIES) - set(merged))
    extra = sorted(set(merged) - set(QUERIES))
    assert not missing, f"catalog queries without an sf1 row: {missing}"
    assert not extra, f"rows for unknown queries: {extra}"

    n_fail = sum(
        0
        if (
            r["rows_match"]
            and r["schema_match"] in (True, None)
            and r["hash_match"] in (True, None)
            and r["err"] is None
        )
        else 1
        for r in merged.values()
    )
    out = {
        "sf": "sf1 (/tmp/etl_sf1, tools/gen_sf1.py)",
        "checked": len(merged),
        "failed": n_fail,
        "shared_witness_cost": heavy_doc.get("shared", {}),
        "results": dict(sorted(merged.items())),
    }
    if args.note:
        tag, sep, text = args.note.partition(":")
        if not sep or not text.strip():
            ap.error("--note must be '<tag>: <text>' (e.g. --note 'r11: ...')")
        out = {**{k: v for k, v in out.items() if k != "results"},
               f"note_{tag.strip()}": text.strip(),
               "results": out["results"]}
    Path(args.out).write_text(json.dumps(out, indent=1) + "\n")
    print(
        json.dumps(
            {"checked": len(merged), "failed": n_fail, "artifact": args.out}
        )
    )
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
