"""Scaling evidence: run headline operators at sf0.001 / sf0.01 / sf0.1 and
report wall-clock growth vs data growth.

A shuffle-clean operator should scale ~linearly in rows (10x data -> ~10x
work, and on local[32] well under 10x wall while cores are idle); a
quadratic or driver-bound operator shows super-linear growth here long
before it kills a 100 TB run. The headline set covers each family's
cost center: LSH near-dedup + star CC, SimHash banding, curation E2E,
packing prefix sums, IVF ANN, substring spans, PageRank iterations, and
the flagship grouped aggregate.

Usage: python tools/scaling_check.py [sf_dir ...] [--only a,b]
       -> one JSON line + a table on stderr

``--only`` restricts the headline set — the sf10 fourth-decade cells
(VERDICT r11 #4) measure the 2-3 ops whose sf10 working set fits the
sandbox disk, not the whole list.
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
    # round-12 additions: the web-corpus dedup tier and the scale-real
    # linkage blocking key
    "url_canonical_dedup",
    "fs_linkage_scores_fine",
    # round-13 addition: hard-negative mining on the bucketed scale path
    "hard_negative_mining_lsh",
]

#: default three driver-shipped decades; pass extra dirs as argv to extend
#: (e.g. the gen_sf1.py-derived /tmp/etl_sf1 for a FOURTH decade)
SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def main() -> None:
    args = list(sys.argv[1:])
    headline = HEADLINE
    if "--only" in args:
        i = args.index("--only")
        if i + 1 >= len(args):
            sys.exit("scaling_check: --only requires a comma-separated list")
        keep = {n for n in args[i + 1].split(",") if n}
        unknown = keep - set(QUERIES)
        if unknown:
            sys.exit(
                f"scaling_check: unknown queries in --only: {sorted(unknown)}"
            )
        headline = [n for n in HEADLINE if n in keep] + sorted(
            keep - set(HEADLINE)
        )
        del args[i : i + 2]
    sfs = args if args else SFS
    labels = [p.rstrip("/").rsplit("/", 1)[-1] for p in sfs]
    spark = get_spark("scaling_check")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JIT warm-up
    out: dict[str, dict[str, float]] = {}
    for name in headline:
        out[name] = {}
        for sf, label in zip(sfs, labels):
            # best-of-2: the first touch of a NEW sf dir pays cold parquet
            # page-cache + larger-shuffle JIT that has nothing to do with
            # the operator's work growth (measured: simhash at sf1 12.8 s
            # cold vs 3.5 s warm) — the scaling RATIO must compare warm work
            best = None
            for _ in range(2):
                t0 = time.perf_counter()
                with scoped_storage(spark):
                    QUERIES[name].build(spark, sf).write.format("noop").mode(
                        "overwrite"
                    ).save()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            out[name][label] = round(best, 3)
    hdr = "".join(f"{lb:>12s}" for lb in labels) + "".join(
        f"{'x(' + labels[i + 1] + '/' + labels[i] + ')':>22s}"
        for i in range(len(labels) - 1)
    )
    print(f"{'query':32s}{hdr}", file=sys.stderr)
    for name, t in out.items():
        vals = "".join(f"{t[lb]:12.2f}" for lb in labels)
        ratios = "".join(
            f"{t[labels[i + 1]] / max(t[labels[i]], 1e-9):22.2f}"
            for i in range(len(labels) - 1)
        )
        print(f"{name:32s}{vals}{ratios}", file=sys.stderr)
    sys.stdout.write(json.dumps({"scaling": out}) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
