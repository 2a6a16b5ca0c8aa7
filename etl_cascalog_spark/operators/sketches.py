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
    bigger build sides (16 MB of bitmap covers ~12M keys at 1%). The size
    is CAPPED at 2^27 bits (16 MB) because the finished bitmap is both
    collected to the driver and re-entered into plans as a literal array
    by :func:`bloom_probe` — past that, use Spark's own
    ``spark.sql.optimizer.runtime.bloomFilter`` or a join.
    """
    if m_bits % 64 != 0:
        raise ValueError(f"bloom_build: m_bits={m_bits} must be a multiple of 64")
    if m_bits > (1 << 27):
        raise ValueError(
            f"bloom_build: m_bits={m_bits} exceeds the 2^27 (16 MB) cap -- "
            "the bitmap is collected to the driver and embedded in plans as "
            "a literal by bloom_probe, so it must stay broadcast-variable "
            "sized. For larger build sides use a semi-join or Spark's "
            "runtime bloom filter instead."
        )
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


def portable_hash32(col: Column) -> Column:
    """32-bit avalanche hash as portable EXACT integer Column math — the
    shared mixing primitive of :func:`hll_distinct` and the deterministic
    hash-sampling queries. Two rounds of ``h = ((h >> 16) ^ h) * 0x45d9f3b
    mod 2^32`` then a final fold (the public Hash Prospector low-bias
    constant). Every intermediate product is ``< 2^32 * 0x45d9f3b < 2^63``,
    so any engine with BIGINT xor/shift/multiply reproduces it bit-for-bit
    — no wrapping-multiply semantics and no engine-private hash function.
    """
    h = F.pmod(col.cast("long"), F.lit(1 << 32))
    for _ in range(2):
        h = F.pmod(
            (F.call_function("shiftrightunsigned", h, F.lit(16)).bitwiseXOR(h))
            * F.lit(0x45D9F3B),
            F.lit(1 << 32),
        )
    return F.call_function("shiftrightunsigned", h, F.lit(16)).bitwiseXOR(h)


def portable_hash32_sql(expr: str) -> str:
    """The DuckDB/ANSI rendering of :func:`portable_hash32` for oracle SQL.
    The input expression is textually duplicated per round (SQL has no
    let-binding outside CTEs); callers with long inputs should pre-bind a
    CTE column.

    The first reduction is rendered as a double-modulo so it matches
    Spark's ``pmod`` on NEGATIVE inputs too (DuckDB's ``%`` keeps the
    dividend's sign; a signed key would otherwise flow a negative ``h``
    into the arithmetic shift and diverge bit-for-bit). Later rounds
    operate on already-non-negative values, where one ``%`` suffices.
    """
    h = f"(((CAST({expr} AS BIGINT) % 4294967296) + 4294967296) % 4294967296)"
    for _ in range(2):
        h = f"((xor({h} >> 16, {h}) * 73244475) % 4294967296)"
    return f"xor({h} >> 16, {h})"


# ---------------------------------------------------------------------------
# HyperLogLog (explicit, engine-portable)
# ---------------------------------------------------------------------------


def hll_distinct(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    p: int = 8,
) -> DataFrame:
    """Explicit HyperLogLog distinct-count estimate per group — the
    mergeable-sketch sibling of Spark's built-in ``approx_count_distinct``
    (HLL++), written as portable integer Column math so an independent
    engine running the same arithmetic produces the IDENTICAL estimate
    (``approx_count_distinct`` itself is implementation-defined and can
    only be rows-only-checked; catalog.hll_distinct_users hash-matches
    this one against DuckDB).

    Flajolet et al.'s original estimator, ``m = 2**p`` registers:

    - hash: the public-domain 32-bit avalanche mixer
      ``h = ((h>>16)^h) * 0x45d9f3b mod 2^32`` twice, then ``(h>>16)^h``
      (Hash Prospector's low-bias constant) — every product is
      ``< 2^32 * 0x45d9f3b < 2^63``, so the whole hash is EXACT BIGINT
      math in any engine, no wrapping multiply and no engine-private
      hash. A single multiplicative (Knuth) hash is NOT enough: its low
      bits inherit key stride (a stride-26 key set hits exactly half the
      registers and estimates 177 for 2000), and even its top bits leave
      ~2x bias on sequential ids; the two xor-multiply rounds bring all
      tested key patterns (strided / sequential / random) within ~5%;
    - register ``j`` = TOP ``p`` bits (best-mixed); ``w`` = low
      ``W = 32 - p`` bits; ``rho = W - bitlen(w) + 1`` (``W+1`` for
      ``w = 0``) via the binary-string length, identical in Spark and
      ANSI-ish SQL;
    - per-register max, then the harmonic mean. The 2^-M_j sum is scaled
      by ``2^(W+1)`` into an EXACT BIGINT (``S = Σ 2^(W+1-M_j)``, absent
      registers contribute ``2^(W+1)`` each), so the only float op is the
      final ``alpha * m² * 2^(W+1) / S`` division — deterministic given
      equal S. Small-range correction: linear counting ``m·ln(m/V)`` when
      ``E <= 2.5m`` and some register is empty.

    100 TB posture: the groupBy partial-aggregates to ≤ m rows per group
    per partition BEFORE the exchange (register state is the only thing
    shuffled — KBs per group at any input size), and register maxes merge
    associatively, so the same pass serves incremental refresh: store the
    register frame, union new data's registers, re-max. That mergeability
    is the reason to carry an explicit HLL next to the exact
    count-distinct (whose Expand-based distinct must re-shuffle raw keys
    every refresh).

    Returns ``group_cols + (n_registers_hit, est_distinct)`` with
    ``est_distinct`` rounded to 2 dp.
    """
    return hll_estimate(hll_registers(df, key_col, group_cols, p), group_cols, p)


def hll_registers(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    p: int = 8,
) -> DataFrame:
    """The sketch STATE half of :func:`hll_distinct`: per-group register
    maxes ``group_cols + (__reg, __mj)``. Exposed separately because the
    state is the mergeable object — union register frames from different
    groups/partitions/time windows, re-``max`` per register, then
    :func:`hll_estimate`; catalog.rolling_distinct_users_hll merges daily
    registers into rolling 7-day sketches this way, which an exact
    count-distinct can only do by re-scanning raw keys.
    """
    w_bits = 32 - p
    mixed = df.select(*group_cols, portable_hash32(F.col(key_col)).alias("__h"))
    reg = F.expr(f"shiftrightunsigned(__h, {w_bits})")  # top p bits
    w = F.pmod(F.col("__h"), F.lit(1 << w_bits))
    rho = F.when(w == 0, F.lit(w_bits + 1)).otherwise(
        F.lit(w_bits) + 1 - F.length(F.bin(w))
    )
    return (
        mixed.select(*group_cols, reg.alias("__reg"), rho.alias("__rho"))
        .groupBy(*group_cols, "__reg")
        .agg(F.max("__rho").alias("__mj"))
    )


def hll_estimate(regs: DataFrame, group_cols: list[str], p: int = 8) -> DataFrame:
    """The estimator half: collapse a ``(group_cols, __reg, __mj)``
    register frame (from :func:`hll_registers`, possibly after merging)
    into ``group_cols + (n_registers_hit, est_distinct)``.
    """
    m = 1 << p
    w_bits = 32 - p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    scale = w_bits + 1  # terms 2^(scale - mj) are exact BIGINTs, mj <= scale
    per_group = regs.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("__n_present"),
        F.sum(F.expr(f"shiftleft(1L, {scale} - __mj)")).alias("__s_present"),
    )
    v = F.lit(m) - F.col("__n_present")  # empty registers
    s = F.col("__s_present") + v * F.lit(1 << scale)
    e_raw = F.lit(alpha * m * m * float(1 << scale)) / s.cast("double")
    e = F.when(
        (e_raw <= F.lit(2.5 * m)) & (v > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v.cast("double")),
    ).otherwise(e_raw)
    return per_group.select(
        *group_cols,
        F.col("__n_present").cast("long").alias("n_registers_hit"),
        F.round(e, 2).cast("double").alias("est_distinct"),
    )
