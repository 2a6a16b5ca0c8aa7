"""Catalog-wide partition-invariance gate.

Every query docstring that says "deterministic" is implicitly claiming:
the RESULT does not depend on how Spark parallelized it. That claim is
what breaks first at cluster scale — float sums re-associate across
partitions, unsorted collect_list orders differ, sample() redraws, ties
flip — and it is invisible to the DuckDB oracle gate when both runs use
the same local[32] partitioning. This suite re-runs a representative
slice of the catalog under a DELIBERATELY different shuffle-partition
count (7: odd, small, co-prime with 32) and asserts sorted-row equality
with the default-config result.

The slice covers each determinism mechanism the engine relies on:
decimal-exact money aggregation, sorted map/array intermediates,
round-before-rank, integer-grid k-means/graph math, hash (not sample)
splits, banded candidate joins, window tie-breaks, and the nested-JSON
report assembly.
"""

from __future__ import annotations

import pytest

from etl_cascalog_spark.catalog import QUERIES
from etl_cascalog_spark.session import release_all_blocks, scoped_storage

SF = "/root/testdata/sf0.001"

#: one query per determinism mechanism (comment = what it certifies)
REPRESENTATIVES = [
    "pricing_summary",          # decimal-exact money sums across partitions
    "pivot_kv_lookup",          # sorted collect_kv map assembly
    "collect_set_agg",          # set collection canonicalized by sort
    "bm25_lexical_topk",        # round-6dp-before-rank + id tie-break
    "window_rank_suite",        # rank/ntile tie semantics on a total order
    "url_canonical_dedup",      # min-per-key dedup on a derived key
    "minhash_lsh_dedup",        # banded candidate join + exact verify
    "semantic_dedup_kmeans",    # integer-grid Lloyd's, tie -> lower cid
    "pagerank_copurchase",      # integer rank pool, fixed rounds
    "cluster_keyed_split_audit",  # CC labels + md5 hash split
    "trgx_nested_json",         # deterministic nested JSON assembly
    "surrogate_ids",            # range-partitioned dense ids
    "mad_outlier_stats",        # bucketed exact percentiles
    "hll_distinct_users",       # register maxes (order-free)
]


def _rows(df):
    cols = sorted(df.columns)
    return sorted(
        tuple(str(r[c]) for c in cols) for r in df.select(*cols).collect()
    )


@pytest.mark.parametrize("name", REPRESENTATIVES)
def test_result_invariant_under_shuffle_partitions(spark, name):
    assert name in QUERIES, f"representative {name} vanished from catalog"
    prior = spark.conf.get("spark.sql.shuffle.partitions")
    with scoped_storage(spark):
        base = _rows(QUERIES[name].build(spark, SF))
    release_all_blocks(spark)
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        with scoped_storage(spark):
            alt = _rows(QUERIES[name].build(spark, SF))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prior)
        release_all_blocks(spark)
    assert base == alt, (
        f"{name}: result depends on shuffle partitioning "
        f"({len(base)} vs {len(alt)} rows; first diff: "
        f"{next((a, b) for a, b in zip(base, alt) if a != b) if len(base) == len(alt) else 'row count'})"
    )
