"""Probabilistic sketch operators: count-min sketch and Bloom filter,
both built as deterministic JVM-side Column math (``xxhash64`` rows, exact
integer aggregation — no sampling, no RNG, bit-identical at any
parallelism).

Why these exist in a 100 TB engine (beyond-reference; the reference's jobs
always exact-aggregate — e.g. the count/max reports of
``src/hadoop/cocacola/m_cocacola_vender_count.clj:20-34``):

- **Count-min sketch**: heavy-hitter detection over a key space too large
  to exact-count (trillions of events × millions of users). The sketch is
  ``depth × width`` counters — KBs — regardless of input size, and its
  one-sided error (never undercounts) makes it a sound CANDIDATE filter:
  every true heavy hitter is in the candidate set, then one exact pass
  over only the candidate keys removes the false positives. The final
  answer is exact; the sketch only bounds the expensive part.
- **Bloom filter**: runtime row-level join pruning — hash the (small)
  build side's join keys into an ``m``-bit bitmap, probe each fact row
  BEFORE the shuffle, and only surviving rows pay exchange + join cost.
  This is the same shape as Spark's own runtime bloom-filter join
  (``spark.sql.optimizer.runtime.bloomFilter.enabled``), implemented
  explicitly so the pruning is plan-visible and engine-portable. No
  false negatives: the bitmap contains every true build-side key, so
  ``bloom-prefilter → exact join`` ≡ ``exact join``.

Related: HyperLogLog distinct-count sketching lives in
:mod:`etl_cascalog_spark.operators.profiling` (``approx_distinct_profile``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Count-min sketch
# ---------------------------------------------------------------------------


def cms_build(df: DataFrame, key_col: str, depth: int = 4, width: int = 512) -> DataFrame:
    """Build a count-min sketch over ``df[key_col]`` → ``(seed, slot, cnt)``.

    One wide explode (``depth`` rows per input row — map-side, no data
    copy of non-key columns) + one hash aggregation. Output is at most
    ``depth × width`` rows (KBs) no matter the input size; partial
    (map-side) aggregation collapses each partition to ≤ depth×width rows
    before the exchange, so the shuffle is metadata-sized at 100 TB.
    """
    seeds = F.array(*[F.lit(i) for i in range(depth)])
    return (
        df.select(F.col(key_col).alias("__k"))
        .select(F.explode(seeds).alias("seed"), "__k")
        .groupBy(
            "seed",
            F.pmod(F.xxhash64(F.col("__k"), F.col("seed")), F.lit(width)).alias("slot"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(sketch: DataFrame, keys: DataFrame, key_col: str, depth: int = 4, width: int = 512) -> DataFrame:
    """Point-estimate counts for ``keys[key_col]`` against a built sketch →
    ``(key_col, est)`` with ``est = min over seeds of the hashed slot``.

    Guarantee (one-sided): ``est ≥ true count`` always — collisions only
    ADD. The sketch side is KB-sized, so the join broadcasts.
    """
    seeds = F.array(*[F.lit(i) for i in range(depth)])
    probes = keys.select(F.col(key_col).alias("__k")).distinct().select(
        "__k", F.explode(seeds).alias("seed")
    ).withColumn("slot", F.pmod(F.xxhash64(F.col("__k"), F.col("seed")), F.lit(width)))
    return (
        probes.join(F.broadcast(sketch), ["seed", "slot"], "left")
        .groupBy("__k")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
        .select(F.col("__k").alias(key_col), "est")
    )


def cms_heavy_hitter_candidates(
    df: DataFrame, key_col: str, threshold: int, depth: int = 4, width: int = 512
) -> DataFrame:
    """Keys whose CMS estimate ≥ ``threshold`` — a SUPERSET of the true
    heavy hitters (one-sided error). Feed this to an exact count over only
    the candidate keys to get the exact heavy-hitter set; see
    ``catalog.cms_heavy_hitters`` for the composed pipeline.
    """
    sketch = cms_build(df, key_col, depth, width)
    est = cms_estimate(sketch, df, key_col, depth, width)
    return est.where(F.col("est") >= threshold)


# ---------------------------------------------------------------------------
# Bloom filter
# ---------------------------------------------------------------------------


def bloom_build(df: DataFrame, key_col: str, m_bits: int = 1 << 14, k: int = 3) -> list[int]:
    """Build an ``m_bits``-bit Bloom filter over ``df[key_col]`` → Python
    list of ``m_bits // 64`` int64 words (the bitmap).

    The build is distributed: per key × seed, a bit index
    ``xxhash64(key, seed) mod m``; bits fold into words via ``bit_or``
    partial aggregation, so the exchange carries ≤ ``m/64`` rows per
    partition. Only the FINISHED bitmap — ``m/8`` bytes, e.g. 2 KB for the
    default — is collected to the driver, the same driver-side footprint
    as Spark's own runtime bloom filter / a broadcast variable. NOT a
    data-sized collect: the bitmap size is a constant chosen up front.

    Sizing: false-positive rate ≈ (1 − e^(−k·n/m))^k; the default
    (m=16384, k=3) gives ~3% at n=2000 build keys. Raise ``m_bits`` for
    bigger build sides (64 MB of bitmap covers ~50M keys at 1%).
    """
    if m_bits % 64 != 0:
        raise ValueError(f"bloom_build: m_bits={m_bits} must be a multiple of 64")
    n_words = m_bits // 64
    seeds = F.array(*[F.lit(i) for i in range(k)])
    words = (
        df.select(F.col(key_col).alias("__k"))
        .distinct()
        .select(F.explode(seeds).alias("seed"), "__k")
        .select(F.pmod(F.xxhash64(F.col("__k"), F.col("seed")), F.lit(m_bits)).alias("bit"))
        .groupBy((F.col("bit") / 64).cast("int").alias("word_idx"))
        # call_function: the SQL shiftleft accepts a Column shift amount
        # (the PySpark wrapper insists on a Python int)
        .agg(
            F.bit_or(
                F.call_function("shiftleft", F.lit(1).cast("long"), (F.col("bit") % 64).cast("int"))
            ).alias("word")
        )
        .collect()
    )
    bitmap = [0] * n_words
    for r in words:
        bitmap[r["word_idx"]] = r["word"]
    return bitmap


def bloom_probe(col: Column, bitmap: list[int], m_bits: int, k: int = 3) -> Column:
    """Boolean membership probe of ``col`` against a built bitmap: true iff
    ALL ``k`` hashed bits are set. The bitmap enters the plan as a literal
    array (constant, codegen-resident — no join, no broadcast exchange);
    each probe is ``k`` element_at + shift/mask ops, pure codegen.
    """
    arr = F.array(*[F.lit(w).cast("long") for w in bitmap])
    cond = F.lit(True)
    for seed in range(k):
        bit = F.pmod(F.xxhash64(col, F.lit(seed)), F.lit(m_bits))
        word = F.element_at(arr, (bit / 64).cast("int") + 1)
        cond = cond & (
            F.call_function("shiftrightunsigned", word, (bit % 64).cast("int")).bitwiseAND(
                F.lit(1).cast("long")
            )
            == 1
        )
    return cond
