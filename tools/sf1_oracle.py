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
- **pagerank / triangle**: staged temp-table twins of the catalog oracles
  (identical algebra, proven equal at sf0.01 in tests).

The connected-components family left this tool in round 11: the catalog
oracles themselves now use unrolled self-verifying min-label propagation
(``catalog._cc_labels_sql``), affordable verbatim at sf1 in the main sweep.

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
# prefix_filter_jaccard_dedup in round 10, and the whole CC family
# (neardup_clusters, neardup_clusters_star, dedup_cluster_sizes,
# neardup_keep_best, cluster_keyed_split_audit, corpus_curation_pipeline,
# training_data_pipeline) in round 11: their catalog oracles now run
# VERBATIM at sf1 in the MAIN sweep (tools/correctness_local.py) — the
# round-11 catalog rewrite replaced the quadratic recursive-closure CC
# fragment with unrolled self-verifying min-label propagation
# (catalog._cc_labels_sql; ~32 s/query at sf1, dominated by the shingle
# join), which DuckDB 1.0 executes without `WITH RECURSIVE … USING KEY`.
# Round-10 floor check on the rest: pagerank_copurchase verbatim ran
# >570 s without finishing (monolithic CTE chain re-derives edges per
# iteration); triangle_count verbatim exhausted 59 GB of spill disk at a
# 48 GB memory limit (DuckDB 1.0.0 materializes the 3×-referenced `kept`
# chain). The 4 below genuinely need the banded / numpy-int64 /
# staged-temp-table witnesses until the local DuckDB grows a cheaper
# plan (the wheel upgrade suggested in VERDICT r10 #3 is blocked: this
# sandbox has no network and installs are out of policy).
HEAVY = [
    "simhash_dedup",
    "semantic_dedup_kmeans",
    "pagerank_copurchase",
    "triangle_count",
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
# pagerank / triangle: staged temp-table witnesses
# ---------------------------------------------------------------------------
# The catalog oracles are correct but MONOLITHIC: at sf1 DuckDB's planner
# materializes the multiply-referenced CTE chains (edges re-derived per
# iteration, deg twice, the path join in one shot) and spilled >60 GB of
# temp — twice exhausting the disk. The witnesses below run the SAME
# algebra (each stage mirrors its CTE line for line) as staged temp
# tables, with the triangle path join stratified by hash(u) so no single
# probe materializes the full path set. Exactness is preserved: stages
# are exact relational ops, and strata partition the e1 edge set.


def pagerank_witness(con) -> pd.DataFrame:
    """Staged twin of the pagerank_copurchase oracle: 3 integer PageRank
    rounds, each one edge join over materialized (src, dst, out_deg)."""
    con.execute(
        """CREATE OR REPLACE TEMP TABLE pr_bounded AS
        WITH baskets AS (
          SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
        ), sizes AS (SELECT ok, count(*) AS n FROM baskets GROUP BY ok)
        SELECT b.ok, b.pk FROM baskets b JOIN sizes s ON b.ok = s.ok
        WHERE s.n <= 7"""
    )
    con.execute(
        """CREATE OR REPLACE TEMP TABLE pr_edges AS
        SELECT DISTINCT a.pk AS src, b.pk AS dst
        FROM pr_bounded a JOIN pr_bounded b ON a.ok = b.ok AND a.pk != b.pk"""
    )
    con.execute(
        """CREATE OR REPLACE TEMP TABLE pr_ce AS
        SELECT e.src, e.dst, d.out_deg FROM pr_edges e
        JOIN (SELECT src, count(*) AS out_deg FROM pr_edges GROUP BY src) d
          ON e.src = d.src"""
    )
    n_nodes = con.execute(
        "SELECT count(DISTINCT node) FROM (SELECT src AS node FROM pr_edges"
        " UNION ALL SELECT dst FROM pr_edges)"
    ).fetchone()[0]
    base = 1_000_000_000_000 // n_nodes
    con.execute(
        f"""CREATE OR REPLACE TEMP TABLE pr_r AS
        SELECT DISTINCT node, CAST({base} AS BIGINT) AS rank_units
        FROM (SELECT src AS node FROM pr_edges UNION ALL SELECT dst FROM pr_edges)"""
    )
    for _ in range(3):
        con.execute(
            f"""CREATE OR REPLACE TEMP TABLE pr_r2 AS
            WITH s AS (
              SELECT ce.dst AS node,
                     CAST(sum(r.rank_units // ce.out_deg) AS BIGINT) AS s
              FROM pr_ce ce JOIN pr_r r ON ce.src = r.node GROUP BY 1
            )
            SELECT n.node,
                   CAST((15 * CAST({base} AS BIGINT)
                         + 85 * coalesce(s.s, 0)) // 100 AS BIGINT)
                     AS rank_units
            FROM pr_r n LEFT JOIN s ON n.node = s.node"""
        )
        con.execute("CREATE OR REPLACE TEMP TABLE pr_r AS SELECT * FROM pr_r2")
    return con.execute("SELECT node, rank_units FROM pr_r").df()


def triangle_witness(con, strata: int = 16) -> pd.DataFrame:
    """Staged twin of the triangle_count oracle; the path join runs per
    hash(u) stratum of e1 so its intermediate never materializes whole."""
    con.execute(
        """CREATE OR REPLACE TEMP TABLE tr_und AS
        WITH baskets AS (
          SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
        ), sizes AS (SELECT ok, count(*) AS n FROM baskets GROUP BY ok),
        bounded AS (
          SELECT b.ok, b.pk FROM baskets b JOIN sizes s ON b.ok = s.ok
          WHERE s.n <= 5
        )
        SELECT DISTINCT least(a.pk, b.pk) AS u, greatest(a.pk, b.pk) AS v
        FROM bounded a JOIN bounded b ON a.ok = b.ok AND a.pk < b.pk"""
    )
    con.execute(
        """CREATE OR REPLACE TEMP TABLE tr_kept AS
        WITH deg AS (
          SELECT node, count(*) AS d FROM (
            SELECT u AS node FROM tr_und UNION ALL SELECT v FROM tr_und
          ) GROUP BY 1
        )
        SELECT e.u, e.v FROM tr_und e
        JOIN deg du ON du.node = e.u JOIN deg dv ON dv.node = e.v
        WHERE du.d <= 25 AND dv.d <= 25"""
    )
    n_nodes = con.execute(
        "SELECT count(*) FROM (SELECT DISTINCT u AS n FROM tr_kept"
        " UNION SELECT v FROM tr_kept)"
    ).fetchone()[0]
    n_edges = con.execute("SELECT count(*) FROM tr_kept").fetchone()[0]
    n_tri = 0
    for s in range(strata):
        n_tri += con.execute(
            f"""SELECT count(*) FROM tr_kept e1
            JOIN tr_kept e2 ON e2.u = e1.v
            JOIN tr_kept e3 ON e3.u = e1.u AND e3.v = e2.v
            WHERE hash(e1.u) % {strata} = {s}"""
        ).fetchone()[0]
    return pd.DataFrame(
        {
            "n_nodes": [n_nodes],
            "n_edges": [n_edges],
            "n_triangles": [n_tri],
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
        if name == "pagerank_copurchase":
            return pagerank_witness(con)
        if name == "triangle_count":
            return triangle_witness(con)
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
