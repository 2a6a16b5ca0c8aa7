"""Semantic deduplication: k-means partitioning of the embedding space,
then near-duplicate pruning *within* clusters (the SemDeDup recipe —
Abbas et al. 2023, arXiv:2303.09540 — brute-force pair scoring is confined
to one cluster at a time instead of the whole corpus).

Beyond-reference surface (the reference has no embedding operators); sits
beside the hyperplane-LSH / IVF paths in ``operators/similarity.py`` as the
*clustered* candidate-generation strategy.

Determinism contract (the driver hash-compares against a DuckDB oracle):
every arithmetic step is 64-bit INTEGER, so no result depends on
floating-point summation order across partitions.

- embeddings are quantized once to a fixed grid: ``units = round(x · 10⁶)``;
- distances are exact integer ``Σ (aᵢ-bᵢ)²`` (≤ 64·(4·10¹²) ≈ 2.6·10¹⁴,
  comfortably inside int64);
- centroid update is ``sum div count`` (integer division) per dimension —
  integer sums are associative/commutative, so partition order is moot;
- assignment ties break on the lower centroid id.

100 TB shape: per Lloyd iteration, ONE shuffle of the corpus (the
assignment groupBy is map-side-combinable: min-by-struct) and one tiny
centroid aggregate (K·dim longs, broadcast back). The K×N assignment
"cross join" is a BroadcastNestedLoopJoin with the K-row centroid side
broadcast — never a corpus×corpus product. Within-cluster pair scoring is
quadratic only in the largest cluster (cap clusters via K, exactly like IVF
cell sizing: K ≈ √N keeps E[|cluster|²] ≈ N).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: fixed-point grid for embedding coordinates (micro-units)
UNIT_SCALE = 1_000_000


def quantize_embeddings(
    df: DataFrame, id_col: str, vec_col: str
) -> DataFrame:
    """(id, units: array<long>) — embeddings snapped to the integer grid.

    ``round(x·10⁶)`` via half-up on the double value; this is the ONLY
    float→int boundary, applied element-wise (order-free), after which the
    whole pipeline is exact.
    """
    return df.select(
        F.col(id_col).alias("id"),
        F.transform(
            F.col(vec_col),
            lambda x: F.round(x.cast("double") * UNIT_SCALE, 0).cast("long"),
        ).alias("units"),
    )


def _sq_dist(a, b):
    """Exact integer squared L2 between two array<long> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def assign_clusters(points: DataFrame, centroids: DataFrame) -> DataFrame:
    """Nearest-centroid assignment: (id, units, cluster, dist).

    ``centroids`` is (cid, cunits) with K rows — broadcast; the join is a
    BroadcastNestedLoopJoin (K·N pairs, map-side), and the argmin groupBy
    is min-by-struct, which combines map-side. Ties → lower cid.
    """
    scored = points.join(F.broadcast(centroids)).select(
        "id",
        "units",
        F.struct(
            _sq_dist(F.col("units"), F.col("cunits")).alias("dist"),
            F.col("cid").alias("cid"),
        ).alias("cand"),
    )
    # units is constant within each id-group, so first() is
    # value-deterministic and the argmin needs NO join back to `points`
    # (one shuffle per iteration, not two)
    return scored.groupBy("id").agg(
        F.first("units").alias("units"), F.min("cand").alias("best")
    ).select(
        "id",
        "units",
        F.col("best.cid").alias("cluster"),
        F.col("best.dist").alias("dist"),
    )


def recompute_centroids(assigned: DataFrame, dim: int) -> DataFrame:
    """(cid, cunits) — per-cluster integer mean, one dim-wide aggregate.

    ``dim`` explicit sums (no posexplode: a 64-dim corpus would otherwise
    64× its row count through the shuffle); each is ``sum div count`` in
    int64. Empty clusters simply vanish (K shrinks), matching the oracle.
    """
    sums = [
        F.sum(F.col("units")[i]).alias(f"s{i}") for i in range(dim)
    ]
    return (
        assigned.groupBy(F.col("cluster").alias("cid"))
        .agg(F.count("*").alias("n"), *sums)
        .select(
            "cid",
            F.array(
                *[F.expr(f"s{i} div n").cast("long") for i in range(dim)]
            ).alias("cunits"),
        )
    )


def kmeans_fit(
    points: DataFrame, dim: int, k: int = 8, iters: int = 3
) -> DataFrame:
    """Deterministic Lloyd's: seed with the k lowest-id points, run a FIXED
    number of iterations (no convergence test — keeps the oracle an
    unrolled CTE chain, and bounds cluster-job wall time by construction).
    Returns the final assignment (id, units, cluster, dist).

    Block lifecycle (the ``connected_components`` discipline): each
    round's assignment is ``localCheckpoint``-ed so iteration N+1 starts
    from materialized rows instead of re-executing the whole round-chain
    DAG — without this, iteration i costs i passes over the corpus and a
    consumer that references the result twice (the pair self-join in
    :func:`semantic_dedup_pairs`) pays the full chain twice. Round N-1's
    blocks retire as soon as round N is materialized; the RETURNED
    frame's checkpoint stays alive — callers release it via
    ``session.release_all_blocks`` once consumed (at cluster scale:
    ``checkpoint`` to reliable storage instead).
    """
    from etl_cascalog_spark.session import persistent_rdd_ids, unpersist_rdd_ids

    spark = points.sparkSession
    before = persistent_rdd_ids(spark)
    # materialize the point prep ONCE: every round's assignment (and the
    # seed selection) reads these rows — uncached, each of the `iters`
    # rounds re-executed the corpus scan + unit conversion
    points = points.localCheckpoint(eager=True)
    pts_ids = persistent_rdd_ids(spark) - before
    centroids = (
        points.orderBy("id")
        .limit(k)
        .select(
            (F.row_number().over(Window.orderBy("id")) - 1).alias("cid"),
            F.col("units").alias("cunits"),
        )
    )
    seen = persistent_rdd_ids(spark)
    assigned = assign_clusters(points, centroids).localCheckpoint(eager=True)
    prev_ids = persistent_rdd_ids(spark) - seen
    for _ in range(iters - 1):
        centroids = recompute_centroids(assigned, dim)
        seen = persistent_rdd_ids(spark)
        assigned = assign_clusters(points, centroids).localCheckpoint(
            eager=True
        )
        new_ids = persistent_rdd_ids(spark) - seen
        unpersist_rdd_ids(spark, prev_ids)
        prev_ids = new_ids
    unpersist_rdd_ids(spark, pts_ids)  # final assignment is materialized
    return assigned


def semantic_dedup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    k: int = 8,
    iters: int = 3,
    max_dist_units: int = 1_500_000_000_000,
    pair_blocks: int = 8,
) -> DataFrame:
    """SemDeDup: k-means partition, then exact near-dup pairs WITHIN each
    cluster (a < b, integer sq-dist ≤ threshold). The pair join is an
    equi-join on cluster id — candidate volume is Σ|cluster|², never N².

    ``pair_blocks`` (B) fixes the parallelism ceiling of that equi-join:
    with only k join keys, at most k tasks ever compute pair distances —
    measured at sf1 on local[32]: 117 s with the plain k=8 join, 28.7 s
    with B=8 (identical output hash). Each cluster is split into B
    hash sub-blocks and the join key becomes (cluster, lo, hi) over the
    B·(B+1)/2 unordered block pairs — the classic triangle partitioning
    of an all-pairs self-join: row with block s enters pairs (s, j≥s) on
    the left and (i≤s, s) on the right, so every cross-block pair
    materializes exactly once and same-block pairs are halved by the
    id order filter. Candidate volume is IDENTICAL; parallelism is
    k·B(B+1)/2 tasks. B=1 degrades to the plain cluster join.

    Output: (id_a, id_b, cluster, dist) sorted-pair convention —
    bit-identical for every B (distance is symmetric; ids normalized).
    """
    assigned = kmeans_fit(
        quantize_embeddings(df, id_col, vec_col), dim, k, iters
    )
    B = max(int(pair_blocks), 1)
    sb = F.pmod(F.xxhash64(F.col("id")), F.lit(B)).cast("int")
    blocked = assigned.select("cluster", "id", "units", sb.alias("__sb"))
    a = blocked.select(
        "cluster",
        F.col("__sb").alias("__lo"),
        F.explode(F.sequence(F.col("__sb"), F.lit(B - 1))).alias("__hi"),
        F.col("id").alias("id_a"),
        F.col("units").alias("ua"),
    )
    b = blocked.select(
        "cluster",
        F.explode(F.sequence(F.lit(0), F.col("__sb"))).alias("__lo"),
        F.col("__sb").alias("__hi"),
        F.col("id").alias("id_b"),
        F.col("units").alias("ub"),
    )
    same_block = F.col("__lo") == F.col("__hi")
    return (
        a.join(b, ["cluster", "__lo", "__hi"])
        # same-block: full self-cross, keep one orientation. Cross-block:
        # each unordered pair appears exactly once (possibly id_b < id_a) —
        # keep it and normalize the id order below.
        .where(~same_block | (F.col("id_a") < F.col("id_b")))
        .select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
            "cluster",
            _sq_dist(F.col("ua"), F.col("ub")).alias("dist"),
        )
        .where(F.col("dist") <= F.lit(max_dist_units))
    )


def kmeans_cluster_profile(
    df: DataFrame, id_col: str, vec_col: str, dim: int, k: int = 8, iters: int = 3
) -> DataFrame:
    """Per-cluster summary of the fitted partition: size, exact integer
    inertia (Σ dist), and the member id range — the diagnostic a curation
    pipeline reads before deciding per-cluster dedup thresholds."""
    assigned = kmeans_fit(
        quantize_embeddings(df, id_col, vec_col), dim, k, iters
    )
    return assigned.groupBy("cluster").agg(
        F.count("*").cast("long").alias("n_members"),
        F.sum("dist").cast("long").alias("inertia_units"),
        F.min("id").cast("long").alias("min_id"),
        F.max("id").cast("long").alias("max_id"),
    )
