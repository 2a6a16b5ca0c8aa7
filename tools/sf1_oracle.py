"""Exact sf1 oracles for the heavy queries (VERDICT r6 #1).

These queries carried only invariant/rows evidence at sf1 because their
catalog DuckDB oracles are unaffordable there (all-pairs verification or
spill-exhausting monolithic CTE chains). This harness computes the SAME
results with affordable formulations and hash-compares them against the
Spark engine, driver-style:

- **simhash**: the catalog builder's ``banded=True`` variant — the same
  16-bit-band candidate join the engine runs, EXACT at Hamming ≤ 3 by the
  band pigeonhole (validated equal to all-pairs at sf0.01);
- **semantic k-means**: a third-engine witness — quantization to integer
  units in DuckDB (the proven float→int boundary, same expression as the
  catalog oracle), then the Lloyd iterations, tie-broken argmin,
  truncating-division centroid updates, and within-cluster pair distances
  in EXACT numpy int64 (blockwise, no float path);

The connected-components family left this tool in round 11 (the catalog
oracles now use unrolled self-verifying min-label propagation,
``catalog._cc_labels_sql``), and pagerank_copurchase / triangle_count left
in round 12: pinning their multiply-referenced CTEs ``AS MATERIALIZED``
(the same discipline) collapsed the verbatim sf1 runs from >570 s /
59 GB-spill-then-die to 14 s / 2 s with zero spill — the staged temp-table
twins this tool carried are now expressed inside the catalog oracle text
itself, so the main sweep runs them verbatim.

Output: driver-format rows (rows/schema/hash per query) written to
``--out`` (default /tmp/sf1_heavy.json). Merge with the affordable-subset
sweep via tools/sf1_merge.py into CORRECTNESS_local_sf1.json.

Usage: python tools/sf1_oracle.py [--sf /tmp/etl_sf1] [--out PATH]
       [--only a,b]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

from etl_cascalog_spark.catalog import (  # noqa: E402
    QUERIES,
    _simhash_oracle_sql,
)
from etl_cascalog_spark.session import get_spark, scoped_storage  # noqa: E402
from tests.oracle_utils import duckdb_con, normalize  # noqa: E402

# entity_blocking_pairs and fs_linkage_scores left this list in round 9,
# prefix_filter_jaccard_dedup in round 10, the whole CC family
# (neardup_clusters, neardup_clusters_star, dedup_cluster_sizes,
# neardup_keep_best, cluster_keyed_split_audit, corpus_curation_pipeline,
# training_data_pipeline) in round 11 via catalog._cc_labels_sql, and
# pagerank_copurchase / triangle_count in round 12 via AS MATERIALIZED
# pins on their multiply-referenced CTEs (14 s / 2 s verbatim at sf1,
# zero spill — DuckDB 1.0 had been INLINING edges/kept and re-deriving
# the basket fan-out per consumer). The 2 below are genuine floors:
# - simhash_dedup: the catalog oracle is the ALL-PAIRS Hamming join —
#   quadratic by definition (sf1: 200k² = 4e10 pairs); the banded witness
#   here is the same 16-bit-band candidate join the engine runs, exact at
#   Hamming <= 3 by the band pigeonhole. Swapping the catalog oracle to
#   the banded form would make oracle and engine share the banding logic
#   (no longer independent) — the all-pairs form IS the evidence value.
# - semantic_dedup_kmeans: the catalog oracle unrolls Lloyd's in SQL, but
#   the within-cluster pair-distance tail is Σ|cluster|² comparisons over
#   64-dim int64 vectors (~2.6e9 64-wide dot products at sf1 with k=8) —
#   DuckDB 1.0 evaluates the list_transform dot product row-at-a-time;
#   the numpy-int64 witness does the identical exact arithmetic
#   blockwise.
HEAVY = [
    "simhash_dedup",
    "semantic_dedup_kmeans",
]


def _trunc_div(a: np.ndarray, n: int) -> np.ndarray:
    """SQL integer division (DuckDB ``//``, Spark ``div``): truncation
    toward zero — numpy's ``//`` floors, which differs on negatives."""
    return np.sign(a) * (np.abs(a) // n)


def semantic_kmeans_witness(con, k: int = 8, iters: int = 3) -> pd.DataFrame:
    """Third-engine twin of semantic_dedup_kmeans: DuckDB quantization
    (catalog-oracle expression), exact int64 Lloyd iterations + pair
    distances in numpy. Mirrors operators/semantic.py: seed = k lowest
    ids, ties -> lower cid, centroid = sum div count (truncating), final
    pairs within clusters at dist <= 1.5e12."""
    rows = con.execute(
        """SELECT vec_id AS id,
                  list_transform(embedding,
                    x -> CAST(round(CAST(x AS DOUBLE) * 1000000, 0) AS BIGINT))
                    AS units
           FROM embeddings ORDER BY vec_id"""
    ).fetchall()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    units = np.array([r[1] for r in rows], dtype=np.int64)

    seed_idx = np.argsort(ids, kind="stable")[:k]
    cents = units[np.sort(seed_idx)]  # cid 0..k-1 in id order
    cids = np.arange(k, dtype=np.int64)
    assign = None
    for it in range(iters):
        # exact int64 distances to each live centroid; argmin picks the
        # FIRST minimum and cids are ascending -> tie goes to lower cid
        d = np.empty((len(ids), len(cids)), dtype=np.int64)
        for j in range(len(cids)):
            diff = units - cents[j]
            d[:, j] = np.einsum("ij,ij->i", diff, diff)
        assign = cids[np.argmin(d, axis=1)]
        if it < iters - 1:
            live, new_cents = [], []
            for c in np.unique(assign):
                m = assign == c
                s = units[m].sum(axis=0, dtype=np.int64)
                live.append(c)
                new_cents.append(_trunc_div(s, int(m.sum())))
            cids = np.array(live, dtype=np.int64)
            cents = np.array(new_cents, dtype=np.int64)

    out_a, out_b, out_c, out_d = [], [], [], []
    for c in np.unique(assign):
        m = assign == c
        cid_ids, cu = ids[m], units[m]
        order = np.argsort(cid_ids, kind="stable")
        cid_ids, cu = cid_ids[order], cu[order]
        n = len(cid_ids)
        block = 512
        for i0 in range(0, n, block):
            a = cu[i0 : i0 + block]
            diff = a[:, None, :] - cu[None, :, :]  # int64 exact
            dist = np.einsum("ijk,ijk->ij", diff, diff)
            for ii in range(a.shape[0]):
                gi = i0 + ii
                sel = np.arange(gi + 1, n)  # id_a < id_b via sorted ids
                keep = sel[dist[ii, gi + 1 :] <= 1_500_000_000_000]
                if len(keep):
                    out_a.extend([cid_ids[gi]] * len(keep))
                    out_b.extend(cid_ids[keep])
                    out_c.extend([int(c)] * len(keep))
                    out_d.extend(dist[ii, keep])
    return pd.DataFrame(
        {
            "id_a": np.array(out_a, dtype=np.int64),
            "id_b": np.array(out_b, dtype=np.int64),
            "cluster": np.array(out_c, dtype=np.int32),
            "dist": np.array(out_d, dtype=np.int64),
        }
    )


# ---------------------------------------------------------------------------


def compare_frames(got: pd.DataFrame, want: pd.DataFrame) -> dict:
    row = {
        "rows_match": len(got) == len(want),
        "schema_match": list(got.columns) == list(want.columns),
        "hash_match": False,
        "spark_rows": int(len(got)),
        "oracle_rows": int(len(want)),
        "err": None,
    }
    if row["rows_match"] and row["schema_match"]:
        ok = True
        for c in got.columns:
            g, w = got[c], want[c]
            if g.dtype.kind == "f" or w.dtype.kind == "f":
                g, w = g.astype(float), w.astype(float)
            eq = (g == w) | (g.isna() & w.isna())
            if not bool(eq.all()):
                ok = False
                row["err"] = f"values differ in column {c}"
                break
        row["hash_match"] = ok
    return row


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/tmp/etl_sf1")
    ap.add_argument("--out", default="/tmp/sf1_heavy.json")
    ap.add_argument("--only", default=None)
    args = ap.parse_args()
    names = [n for n in args.only.split(",") if n] if args.only else HEAVY

    spark = get_spark("sf1_oracle")
    con = duckdb_con(args.sf)
    results: dict[str, dict] = {}
    t0 = time.perf_counter()

    # shared materializations (timed + attributed in the artifact). The
    # round-11 catalog rewrite retired the doc-graph/pipeline CC splices:
    # those 7 queries run verbatim in the main sweep now.
    shared: dict[str, float] = {}

    def oracle_df(name: str) -> pd.DataFrame:
        if name == "simhash_dedup":
            return con.execute(_simhash_oracle_sql(banded=True)).df()
        if name == "semantic_dedup_kmeans":
            return semantic_kmeans_witness(con)
        return con.execute(QUERIES[name].oracle).df()

    n_fail = 0
    for name in names:
        t = time.perf_counter()
        try:
            with scoped_storage(spark):
                got = normalize(QUERIES[name].build(spark, args.sf).toPandas())
            t_spark = time.perf_counter()
            want = normalize(oracle_df(name))
            row = compare_frames(got, want)
            row["spark_sec"] = round(t_spark - t, 1)
            row["oracle_sec"] = round(time.perf_counter() - t_spark, 1)
        except Exception as e:  # noqa: BLE001 — report, don't abort
            row = {
                "rows_match": False,
                "schema_match": False,
                "hash_match": False,
                "spark_rows": None,
                "oracle_rows": None,
                "err": f"{type(e).__name__}: {e}"[:500],
            }
        good = (
            row["rows_match"] and row["schema_match"] and row["hash_match"]
            and row["err"] is None
        )
        n_fail += 0 if good else 1
        print(
            f"# {'PASS' if good else 'FAIL'} {name} ({row['spark_rows']} rows,"
            f" spark {row.get('spark_sec')}s oracle {row.get('oracle_sec')}s)",
            file=sys.stderr,
        )
        results[name] = row

    out = {"shared": shared, "results": results}
    Path(args.out).write_text(json.dumps(out, indent=1) + "\n")
    print(
        json.dumps(
            {
                "checked": len(results),
                "failed": n_fail,
                "sf": args.sf,
                "wall_sec": round(time.perf_counter() - t0, 1),
                "shared": shared,
                "artifact": args.out,
            }
        )
    )
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
