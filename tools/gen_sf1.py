"""Generate an sf1-equivalent dataset (10x sf0.1) for the third scaling
decade (VERDICT r4 #4).

The driver ships sf0.1 as the largest fixture and the sandbox has no
network (DuckDB's tpch extension cannot download), so sf1 is derived from
sf0.1 by 10x ID-OFFSET REPLICATION — every fact table's keys get a
per-replica stride so FK integrity holds (lineitem replica i joins orders
replica i), dimensions that TPC-H holds fixed (region/nation) stay fixed,
and text/embeddings are deterministically perturbed per replica (the
soak_dedup technique) so dedup families and ANN geometry keep their
structure instead of collapsing into 10-way exact duplicates.

Distribution caveat, stated up front: replication preserves per-replica
value distributions exactly but multiplies global key cardinalities by 10
and correlates replicas. For WALL-CLOCK SCALING RATIOS (what SCALING.md
measures) this is the right trade; for value-level correctness the
sf0.01/sf0.1 oracles remain the evidence.

Usage: python tools/gen_sf1.py [out_dir] [K]  (default /tmp/etl_sf1, K=10)
Writes one parquet per table; ~10 MB in, ~170 MB out. Deterministic.
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
K = 10  # default; argv[2] overrides


def main() -> None:
    global K
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/etl_sf1"
    if len(sys.argv) > 2:
        K = int(sys.argv[2])
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    # keep the 10x-replication spill out of the repo CWD (see
    # tests/oracle_utils.duckdb_con — the .tmp/ incident)
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SRC}/{t}.parquet')"
        )

    strides = {
        k: con.execute(f"SELECT max({c}) FROM {t}").fetchone()[0]
        for k, (t, c) in {
            "S": ("supplier", "s_suppkey"),
            "P": ("part", "p_partkey"),
            "C": ("customer", "c_custkey"),
            "O": ("orders", "o_orderkey"),
            "E": ("events", "event_id"),
            "U": ("events", "user_id"),
            "D": ("documents", "doc_id"),
        }.items()
    }
    # stride = max+1: several id spaces are 0-based (doc_id, event_id…) and
    # a max-only stride collides the last base id with replica 1's first
    # (found the hard way: two doc_id-4999 rows made the sf1 bpe oracle's
    # per-doc GROUP BY merge two documents)
    s = {k: int(v) + 1 for k, v in strides.items()}

    def emit(table: str, replica_sql: str | None) -> None:
        if replica_sql is None:  # fixed dimension: copy verbatim
            sql = f"SELECT * FROM {table}"
        else:
            sql = " UNION ALL ".join(
                replica_sql.format(i=i, **s) for i in range(K)
            )
        con.execute(
            f"COPY ({sql}) TO '{out}/{table}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{out}/{table}.parquet')"
        ).fetchone()[0]
        print(f"{table}: {n} rows", file=sys.stderr)

    emit("region", None)
    emit("nation", None)
    emit(
        "supplier",
        "SELECT * REPLACE (CAST(s_suppkey + {i} * {S} AS BIGINT) AS s_suppkey)"
        " FROM supplier",
    )
    emit(
        "part",
        "SELECT * REPLACE (CAST(p_partkey + {i} * {P} AS BIGINT) AS p_partkey)"
        " FROM part",
    )
    emit(
        "customer",
        "SELECT * REPLACE (CAST(c_custkey + {i} * {C} AS BIGINT) AS c_custkey)"
        " FROM customer",
    )
    emit(
        "orders",
        "SELECT * REPLACE (CAST(o_orderkey + {i} * {O} AS BIGINT) AS o_orderkey,"
        " CAST(o_custkey + {i} * {C} AS BIGINT) AS o_custkey) FROM orders",
    )
    emit(
        "lineitem",
        "SELECT * REPLACE (CAST(l_orderkey + {i} * {O} AS BIGINT) AS l_orderkey,"
        " CAST(l_partkey + {i} * {P} AS BIGINT) AS l_partkey,"
        " CAST(l_suppkey + {i} * {S} AS BIGINT) AS l_suppkey) FROM lineitem",
    )
    emit(
        "events",
        "SELECT * REPLACE (CAST(event_id + {i} * {E} AS BIGINT) AS event_id,"
        " CAST(user_id + {i} * {U} AS BIGINT) AS user_id) FROM events",
    )
    # text perturbed per replica (soak_dedup convention): exact-dup families
    # keep their within-replica structure, replicas don't merge
    emit(
        "documents",
        "SELECT * REPLACE (CAST(doc_id + {i} * {D} AS BIGINT) AS doc_id,"
        " CASE WHEN {i} = 0 THEN text ELSE text || ' variant{i}' END AS text)"
        " FROM documents",
    )
    # deterministic per-(vec,replica) jitter keeps ANN geometry non-degenerate.
    # vec_id strides by D (the DOCUMENTS stride), not its own max: the engine
    # joins embeddings.vec_id == documents.doc_id (hybrid_search_rerank et
    # al.), so replica i's vector for base doc v must land on doc v's new id
    # v + i*D. An independent stride scrambles the doc<->vector pairing and
    # strands 60% of docs with no embedding (vec ids are a strict subset of
    # doc ids in the base data).
    emit(
        "embeddings",
        "SELECT * REPLACE (CAST(vec_id + {i} * {D} AS BIGINT) AS vec_id,"
        " list_transform(embedding, x -> CAST(x + 0.01 * sin(vec_id * 7.0"
        " + {i}) AS FLOAT)) AS embedding) FROM embeddings",
    )
    print(out)


if __name__ == "__main__":
    main()
