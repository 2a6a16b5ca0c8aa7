"""SparkSession factory tuned for both local testing and cluster scale.

The reference runs each job in a fresh JVM over Hadoop MR with zero
application-level tuning (``/root/reference/src/cocacola/rpt/cascalog.sh:37-119``,
``resources/job-conf.clj:1-2``). Here a single session serves all pipelines;
AQE handles runtime re-planning (partition coalescing, skew joins) so the same
code works at local[32]/sf0.1 and on a 1000-executor cluster at 100 TB.
"""

from __future__ import annotations

import os
from contextlib import contextmanager

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "etl_cascalog_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-conscious defaults.

    Defaults chosen for a 100 TB posture:

    - AQE on (runtime partition coalescing, skew-join splitting, dynamic
      broadcast conversion) — replaces hand-scheduling.
    - ``spark.sql.shuffle.partitions`` ~ cores locally; on a real cluster AQE
      coalesces from a deliberately-high initial number.
    - UTC session timezone so timestamp semantics match the DuckDB oracle and
      are cluster-location-independent.
    - Arrow enabled for the (rare) pandas-UDF paths.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # wide-aggregate plans (64-column sketches) stay in whole-stage
        # codegen instead of falling back to interpreted mode
        .config("spark.sql.codegen.maxFields", "256")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def persistent_rdd_ids(spark: SparkSession) -> set[int]:
    """IDs of every RDD currently holding blocks in the BlockManager —
    caches AND ``localCheckpoint`` data (the latter is invisible to
    ``spark.catalog.clearCache``, which only walks the SQL cache manager).
    """
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    return {int(k) for k in jmap.keys()}


def unpersist_rdd_ids(
    spark: SparkSession, ids: set[int], blocking: bool = False
) -> None:
    """Drop the blocks of specific persistent RDDs by id (no-op for ids
    already gone). Used by iterative operators to retire round ``N-1``'s
    ``localCheckpoint`` as soon as round ``N`` is materialized, so a
    bounded-iteration build holds at most one round of blocks."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    for rid, jrdd in list(jmap.items()):
        if int(rid) in ids:
            jrdd.unpersist(blocking)


@contextmanager
def scoped_storage(spark: SparkSession, blocking: bool = False):
    """Scope-bound storage lifecycle: every cache / ``localCheckpoint``
    block CREATED inside the ``with`` body is released on exit — the
    structural replacement for the "callers must remember
    :func:`release_all_blocks`" convention (round-3 advice). Storage that
    existed before entry is untouched, so scopes nest safely and library
    users cannot leak blocks from operators that ``.cache()`` internally
    (dedup/similarity builders, ``global_token_offsets``, …).

    Consume the results INSIDE the scope (collect/write/count): frames
    returned by iterative operators are backed by checkpoint blocks that
    die at scope exit.

    Blocks are tracked by RDD-id diff over the BlockManager, which covers
    both SQL ``.cache()`` data and ``localCheckpoint`` data (the latter is
    invisible to ``spark.catalog.clearCache``). A ``.cache()`` whose
    blocks were dropped here simply re-materializes if that exact frame is
    reused later — correctness is unaffected.
    """
    before = persistent_rdd_ids(spark)
    try:
        yield
    finally:
        created = persistent_rdd_ids(spark) - before
        unpersist_rdd_ids(spark, created, blocking)


def release_all_blocks(spark: SparkSession, blocking: bool = False) -> None:
    """Session-level storage reset between independent jobs: SQL cache
    + every persistent RDD, INCLUDING ``localCheckpoint`` blocks.

    ``spark.catalog.clearCache()`` alone leaks localCheckpoint data from
    iterative operators (connected components, incremental dedup); in a
    long session those blocks accumulate until a major GC stalls an
    unlucky later query. Callers that own a long-lived session (bench
    loops, the CLI, notebook users) should call this when a query's
    results have been consumed. NOTE: frames returned by iterative
    operators are backed by checkpoint blocks — release only AFTER
    collecting/writing them."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    for jrdd in list(jmap.values()):
        jrdd.unpersist(blocking)
    spark.catalog.clearCache()
