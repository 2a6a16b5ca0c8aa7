"""Physical data layout: Z-order (Morton) multi-dimensional clustering.

Beyond-reference scale component. At 100 TB the dominant read cost is scan
volume, and parquet row-group min/max skipping only prunes on the *sort*
column of a linear layout. Interleaving the bits of two (or more) query
dimensions into one Morton key and clustering files by that key keeps BOTH
dimensions' min/max ranges tight in every file, so predicates on either
column prune most row groups — the same trick Delta/Iceberg expose as
``OPTIMIZE ... ZORDER BY``, built here from plain Column arithmetic.

Everything is map-side integer bit math (shift/and/or), so it whole-stage
codegens and adds zero shuffle beyond the final ``repartitionByRange`` on
the z-value at write time.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def zvalue(x: Column, y: Column, bits: int = 16, strict: bool = True) -> Column:
    """Morton code of two non-negative ints: bit i of ``x`` lands at 2i,
    bit i of ``y`` at 2i+1. Unrolled shift/and/multiply chain — identical
    arithmetic is expressible in any SQL dialect (see :func:`zvalue_sql`),
    which keeps the operator oracle-checkable bit-for-bit.

    Domain contract: both keys must lie in ``[0, 2**bits)`` — the default
    16 bits covers keys up to 65535 (o_custkey outgrows that around
    sf0.5). Bits above ``bits`` are NOT interleaved, and silently
    truncating them would alias distinct high keys into one Morton code,
    quietly destroying the "tight spans on BOTH dimensions" clustering
    property at exactly the scale the layout is for. ``strict=True``
    (default) therefore raises at run time on out-of-domain keys instead
    of truncating; size ``bits`` to the real column domain (≤ 31 per
    dimension so the interleaved key fits a signed long).
    """
    if not (1 <= bits <= 31):
        raise ValueError(
            f"zvalue: bits={bits} out of range — need 1..31 per dimension "
            "so the interleaved Morton key fits a signed 64-bit long"
        )
    terms = []
    for i in range(bits):
        terms.append((F.shiftright(x, i).bitwiseAND(F.lit(1))) * F.lit(1 << (2 * i)))
        terms.append(
            (F.shiftright(y, i).bitwiseAND(F.lit(1))) * F.lit(1 << (2 * i + 1))
        )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    if strict:
        lim = F.lit(1 << bits)
        ok = (x >= 0) & (x < lim) & (y >= 0) & (y < lim)
        guard = F.assert_true(
            ok,
            f"zvalue: key outside [0, 2^{bits}) — distinct keys would alias "
            "into one Morton code; raise `bits` to cover the column domain "
            "(max 31 per dimension)",
        )
        # assert_true yields NULL on success and raises otherwise, so this
        # `when` always takes the first branch — it exists only to force
        # the guard's evaluation alongside the code
        out = F.when(guard.isNull(), out)
    return out


def quantize_pow2(
    col: Column, lo: int, hi: int, bits: int, strict: bool = True
) -> Column:
    """Map ``col`` ∈ [lo, hi] onto [0, 2**bits) by a RIGHT SHIFT — the
    scale-proof front end of :func:`zvalue` for unbounded key domains
    (o_custkey outgrows 16 raw bits around sf0.5; a z-key only needs
    RELATIVE locality, never absolute key values).

    Power-of-2 cells via shift, deliberately not division: ``(x-lo) >>
    s`` is exact integer math reproducible bit-for-bit in any SQL dialect
    (DuckDB twin: ``(x - lo) >> greatest(0, length(bin(greatest(1, hi -
    lo))) - bits)`` — the inner ``greatest(1, …)`` keeps the twins in
    sync at the degenerate span-0 domain, where Python's
    ``(0).bit_length() == 0`` but DuckDB's ``length(bin(0)) == 1``),
    whereas ``floor((x-lo)*2^bits / span)`` in float is
    double-rounding-unsafe near cell boundaries exactly when spans get
    big. Bounds come in as plain Python ints (a bounded 1-row agg
    collect — the scalar-read class, not a data collect).

    ``strict=True`` (default) raises at run time on values outside
    ``[lo, hi]`` — the same posture as :func:`zvalue`: an out-of-domain
    key would otherwise shift to a negative or aliased cell and quietly
    corrupt the layout; clamping would alias it silently, which is
    worse. Skewed domains get uneven occupancy per cell; if that
    matters, range-partition rank quantization is the alternative (at
    the cost of a sort), same as Delta's OPTIMIZE ZORDER interleaves
    range-partition ids.
    """
    span = hi - lo
    if span < 0:
        raise ValueError(f"quantize_pow2: hi={hi} < lo={lo}")
    shift = max(0, max(1, span).bit_length() - bits)
    q = F.shiftright(col.cast("long") - F.lit(lo), shift)
    if strict:
        ok = (col >= F.lit(lo)) & (col <= F.lit(hi))
        guard = F.assert_true(
            ok,
            f"quantize_pow2: value outside [{lo}, {hi}] — it would shift "
            "to a negative or aliased cell; widen the bounds to the real "
            "column domain (clamping would alias silently)",
        )
        q = F.when(guard.isNull(), q)
    return q


def quantize_pow2_col(
    col: Column, lo: Column, hi: Column, bits: int, strict: bool = True
) -> Column:
    """LAZY-bounds twin of :func:`quantize_pow2`: ``lo``/``hi`` arrive as
    Columns (a broadcast 1-row min/max aggregate cross-joined onto the
    rows), so bound discovery rides the same action as the query — zero
    Spark jobs at plan-build time, the same discipline as the lazy
    anchor guard in ``similarity.hard_negatives``.

    The shift amount mirrors the DuckDB twin exactly:
    ``greatest(0, length(bin(greatest(1, hi - lo))) - bits)`` — bin() of
    a positive long is its minimal binary string, so its length IS
    Python's ``bit_length()`` (the inner greatest keeps span-0 domains in
    sync: ``bin(0)`` has length 1 but ``(0).bit_length() == 0``).
    ``shiftright`` is invoked through the SQL function registry
    (``F.call_function``) because the Python wrapper only accepts a
    literal int shift.

    INLINING CAVEAT: do NOT feed this column into :func:`zvalue` or any
    expression that references it many times — Catalyst inlines the full
    guarded expression (raise_error + format_string) at every reference
    (hot-path lesson 1; measured 2.4× on zorder_layout_stats). For
    multi-reference consumers, compute the shift inside the 1-row bounds
    aggregate, guard the domain in ONE filter stage, and keep the
    per-row expression to a bare ``shiftright`` — the shape
    ``catalog.zorder_layout_stats`` ships.
    """
    span = (hi - lo).cast("long")
    shift = F.greatest(
        F.lit(0), F.length(F.bin(F.greatest(F.lit(1), span))) - F.lit(bits)
    )
    q = F.call_function("shiftright", col.cast("long") - lo.cast("long"), shift)
    if strict:
        ok = (col >= lo) & (col <= hi)
        guard = F.assert_true(
            ok,
            F.format_string(
                "quantize_pow2_col: value outside [%s, %s] — it would "
                "shift to a negative or aliased cell; widen the bounds "
                "to the real column domain (clamping would alias "
                "silently)",
                lo,
                hi,
            ),
        )
        q = F.when(guard.isNull(), q)
    return q


def zvalue_sql(x: str, y: str, bits: int = 16) -> str:
    """The DuckDB/ANSI twin of :func:`zvalue` (``>>``/``&`` operators)."""
    terms = []
    for i in range(bits):
        terms.append(f"(({x} >> {i}) & 1) * {1 << (2 * i)}")
        terms.append(f"(({y} >> {i}) & 1) * {1 << (2 * i + 1)}")
    return " + ".join(terms)


def zorder_bucket_stats(
    df: DataFrame,
    x_col: Column,
    y_col: Column,
    bits: int = 16,
    bucket_bits: int = 4,
    z_x: Column | None = None,
    z_y: Column | None = None,
    strict: bool = True,
) -> DataFrame:
    """Cluster rows into ``2**bucket_bits`` Z-order buckets (top bits of the
    Morton key — a value-based split, NOT an ntile sort, so the assignment
    is pure map-side) and report each bucket's per-dimension min/max spans
    plus row count: exactly the row-group skipping statistics a writer
    would get after a z-order rewrite. Tight spans on BOTH columns = both
    predicates prune.

    At write time the same key feeds ``df.repartitionByRange(F.col("z"))``
    + ``sortWithinPartitions("z")`` so each output file covers one compact
    z-range; this helper is the layout-quality report over that plan.

    ``z_x``/``z_y`` override the columns fed to the Morton interleave
    while the SPAN STATS stay on ``x_col``/``y_col`` — pass
    :func:`quantize_pow2` outputs there when the raw key domain exceeds
    ``2**bits`` (it does for o_custkey past ~sf0.5) so the report keeps
    raw-unit spans.

    ``strict=False`` skips :func:`zvalue`'s per-reference domain guard —
    pass it when the caller already guards the domain ONCE (a filter
    stage), because zvalue references each input ~``bits`` times and
    Catalyst INLINES the full input expression at every reference
    (SCALE.md hot-path lesson 1): a guarded input whose expression
    embeds ``raise_error``/``format_string`` blows the codegen up ~34×
    (measured: 1.5 s → 3.5 s on zorder_layout_stats at sf0.1).
    """
    z = zvalue(
        (x_col if z_x is None else z_x).cast("long"),
        (y_col if z_y is None else z_y).cast("long"),
        bits,
        strict=strict,
    )
    shift = 2 * bits - bucket_bits
    return (
        df.select(
            x_col.cast("long").alias("__x"),
            y_col.cast("long").alias("__y"),
            F.shiftright(z, shift).cast("int").alias("z_bucket"),
        )
        .groupBy("z_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("__x").alias("x_min"),
            F.max("__x").alias("x_max"),
            F.min("__y").alias("y_min"),
            F.max("__y").alias("y_max"),
        )
    )


def write_zordered(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    bits: int = 16,
    n_files: int = 8,
) -> None:
    """Z-order rewrite — the executable form of ``OPTIMIZE ... ZORDER BY``:
    compute the Morton key, ``repartitionByRange`` on it (one range
    shuffle, the ONLY shuffle of the rewrite), sort within partitions,
    and publish atomically (readers never see a partial rewrite).

    Each output file then covers one compact z-range, which keeps BOTH
    dimensions' parquet min/max footers tight — predicates on either
    column prune most files (verified by test via per-file span stats).
    The z column itself is not persisted; it exists only to route rows.
    """
    from etl_cascalog_spark.io import publish_atomic

    z = zvalue(F.col(x_col).cast("long"), F.col(y_col).cast("long"), bits)
    clustered = (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )
    publish_atomic(clustered, path)


def file_span_stats(df_with_file: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """Per-output-file min/max spans of two columns (group by
    ``input_file_name()``) — the skipping stats a reader's footer pass
    sees. Diagnostic twin of :func:`write_zordered`."""
    return (
        df_with_file.groupBy(F.input_file_name().alias("file"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min(x_col).alias("x_min"),
            F.max(x_col).alias("x_max"),
            F.min(y_col).alias("y_min"),
            F.max(y_col).alias("y_max"),
        )
    )


def binpack_plan(
    files: DataFrame,
    partition_cols: list[str],
    size_col: str,
    file_key_cols: list[str],
    target_bytes: int,
) -> DataFrame:
    """Compaction planning for the small-files problem: assign each input
    file to an output bin of ~``target_bytes``, per table partition — the
    planning half of ``OPTIMIZE``-style binpack compaction (Delta/Iceberg
    expose the same operation; here it is plain DataFrame algebra over the
    file-listing frame).

    Sequential next-fit over files ordered largest-first (the classic
    decreasing heuristic, made deterministic with ``file_key_cols`` as the
    tie-break): ``bin = floor(exclusive_running_sum / target)``.  One
    window per partition — no driver loop, no collect.

    Scale posture: this runs over file METADATA (one row per file — even
    100 TB is a few million rows), so the per-partition window sort is
    metadata-sized; the expensive half (actually rewriting each bin's rows)
    is a separate repartition-by-bin write that never touches the planner.
    Files already >= ``target_bytes`` land alone in their bin (the
    exclusive cumsum jumps past a whole target per such file), which is
    exactly the "leave big files alone" behavior compaction wants.

    Returns the input columns plus ``bin_id`` (0-based within partition).
    """
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(F.col(size_col).desc(), *[F.col(c) for c in file_key_cols])
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_excl = F.coalesce(F.sum(size_col).over(w), F.lit(0))
    return files.withColumn(
        "bin_id", F.floor(cum_excl / F.lit(target_bytes)).cast("long")
    )


def compact_rewrite(
    rows: DataFrame,
    plan: DataFrame,
    partition_cols: list[str],
    file_key_cols: list[str],
    path: str,
) -> None:
    """Execute a :func:`binpack_plan`: rewrite the rows so each planned bin
    becomes exactly ONE output file.

    The row frame joins its (partition, file-key) to the plan's ``bin_id``,
    repartitions on (partition, bin) — hash distribution puts each bin
    wholly inside one task — and writes ``partitionBy(partition, bin)``,
    so every bin directory receives exactly one part file from its one
    task. This is the only data-sized step of compaction; the planner
    itself only ever touched file metadata. The join is a broadcast (the
    plan is the file listing — metadata-sized even at 100 TB).
    """
    keys = partition_cols + file_key_cols
    plan_keys = F.broadcast(plan.select(*keys, "bin_id"))
    # coverage gate: a stale/partial plan would silently DROP every row
    # whose key it is missing (the join is inner by design — the write is
    # mode("overwrite")). Cheap: broadcast anti-join + limit-1 probe.
    uncovered = rows.join(plan_keys, on=keys, how="left_anti").limit(1).count()
    if uncovered:
        raise ValueError(
            "compact_rewrite: rows exist whose (partition, file-key) is "
            "absent from the plan — the plan must be derived from the same "
            "snapshot as rows (refusing to drop data on overwrite)"
        )
    joined = rows.join(plan_keys, on=keys, how="inner")
    part_keys = [*partition_cols, "bin_id"]
    (
        joined.repartition(*[F.col(c) for c in part_keys])
        .write.partitionBy(*part_keys)
        .mode("overwrite")
        .parquet(path)
    )
