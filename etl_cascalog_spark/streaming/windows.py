"""Streaming operators: watermarked tumbling/sliding/session windows and
stateful dedup over the ``events`` surface.

The reference is batch-only — its "incrementality" is watermark-style
reload (SURVEY §2.9). This module is the true streaming counterpart: the
same logical aggregations as the batch twins in
:mod:`operators.sessions` (oracle-checked in the catalog), lifted onto
``readStream``/``writeStream``:

- batch ``tumbling_window``  ≙ streaming :func:`tumbling` (same window())
- batch ``sessionize``       ≙ streaming :func:`sessions`
  (``session_window``; streaming session end = last event + gap)
- batch ``exact_dedup``      ≙ streaming :func:`dedup_within_watermark`

Scale: streaming state lives in the state store keyed by (window, group);
watermarks bound state size; ``dropDuplicatesWithinWatermark`` keeps the
dedup state window-bounded instead of unbounded-forever.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the events parquet (file-source micro-batches; in
    production this is the kafka source with identical downstream code).

    A file stream needs an explicit schema, but the generator has shipped
    ``ts`` as both TIMESTAMP(NANOS) (→ nanos-long under the legacy conf)
    and plain timestamp[us] (→ TIMESTAMP_NTZ) across data drops — so the
    schema is taken from the batch parquet footer instead of hardcoded,
    and the nanos→micros conversion applies only when ``ts`` really is a
    long (integer division: double division loses exactness above 2^53,
    epoch-nanos are ~1.7e18). Output ``ts`` type matches io.read_table's,
    keeping the batch/stream twins value-identical.
    """
    import os

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    schema = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema
    # file streaming sources need a directory — glob-filter the events file
    raw = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if isinstance(schema["ts"].dataType, T.LongType):
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif isinstance(schema["ts"].dataType, T.TimestampNTZType):
        # watermarks demand TIMESTAMP (ltz): EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE
        # on NTZ. Session tz is pinned UTC above, so the cast preserves wall
        # values and the batch twins (which keep NTZ) stay value-identical.
        raw = raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw


def tumbling(
    events: DataFrame, duration: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked tumbling window counts/sums per event_type."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", duration), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n",
            "total_value",
        )
    )


def sliding(
    events: DataFrame,
    duration: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked sliding window aggregation."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", duration, slide), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n",
        )
    )


def sessions(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Session windows per user (gap-based). Note the boundary convention:
    streaming ``session_window.end`` = last event ts + gap; the batch twin
    (operators.sessions.session_stats) reports last event ts — assert
    accordingly in equivalence tests."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def sessions_dynamic_gap(
    events: DataFrame,
    gap_expr: Column,
    watermark: str = "2 hours",
) -> DataFrame:
    """Session windows with a PER-EVENT gap (``session_window`` accepts a
    Column): e.g. purchases hold a session open longer than views. The
    gap expression is evaluated per row JVM-side; state bounding via the
    watermark is unchanged. Batch twin: gaps-and-islands with the same
    per-row gap column (see the equivalence test)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap_expr), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("session_window.start").alias("session_start"),
            "user_id",
            "n_events",
        )
    )


def dedup_within_watermark(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Stateful streaming dedup by event_id with watermark-bounded state
    (exactly-once ingestion of an at-least-once source)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["event_id"])


def dedup_by_content(
    stream: DataFrame,
    text_col: str,
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Content-keyed streaming dedup — the streaming twin of batch
    ``operators.dedup.exact_dedup``: key the watermark-bounded state on
    the md5 of normalized content instead of an id, so REPLAYED OR
    RE-CRAWLED duplicates (different event ids, same payload) are dropped
    on ingestion. State carries one 32-char digest per distinct doc in
    the watermark window — bounded, skew-free (digest keys are uniform).
    Batch parity: the kept set per window equals exact_dedup's keep-first
    under the same arrival order."""
    from etl_cascalog_spark.operators.text import fingerprint_md5

    return (
        stream.withColumn("__fp", fingerprint_md5(F.col(text_col)))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["__fp"])
        .drop("__fp")
    )


def dedup_against_corpus(
    stream: DataFrame,
    corpus_digests: DataFrame,
    text_col: str = "text",
    digest_col: str = "digest",
) -> DataFrame:
    """Stream-STATIC anti join: drop streaming documents whose normalized
    content digest already exists in the static curated corpus — the
    exact tier of ``operators.dedup.incremental_dedup`` as a continuous
    ingestion pipeline instead of a daily batch. Compose with
    :func:`dedup_by_content` upstream for within-stream duplicates; the
    static side handles history.

    ``corpus_digests`` is a static frame of one ``digest_col`` column
    (md5 of normalized text — parquet the digests beside the corpus, the
    same steady-state advice as incremental_dedup's signature store).
    Spark re-plans the static side per micro-batch, so a digest table
    refreshed in place is picked up without restarting the query; at
    100 TB the anti join is digest-keyed (uniform 32-char keys, skew-free)
    and the stream side is microbatch-sized, so AQE broadcast-converts
    whenever the batch fits.
    """
    from etl_cascalog_spark.operators.text import fingerprint_md5

    keyed = stream.withColumn("__fp", fingerprint_md5(F.col(text_col)))
    return keyed.join(
        corpus_digests.select(F.col(digest_col).alias("__fp")),
        on="__fp",
        how="left_anti",
    ).drop("__fp")


def interval_join(
    probe: DataFrame,
    ts_col: str,
    intervals: DataFrame,
    start_col: str,
    end_col: str,
    watermark: str = "1 hour",
    bucket_seconds: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Stream-stream interval join — the streaming twin of the batch
    ``operators.joins.range_join``: probe rows land in ``[start, end]`` of
    interval rows, both sides unbounded streams.

    Spark refuses stream-stream joins with no equality predicate (state
    would be a cross product), so this reuses the batch scale path's cell
    trick verbatim: intervals explode (stateless, append-safe) to the
    ``bucket_seconds``-grain cells they overlap, probes map to exactly one
    cell, and the join is equi on ``__cell`` with the BETWEEN residual.
    Watermarks on BOTH event-time columns then bound the join state: a
    buffered row is evicted once the other side's watermark passes its
    cell, so state stays O(watermark-window of data), not O(stream).
    Inner join → append output; each match emits exactly once (the probe's
    cell is unique, so no dedup pass).

    ``how="left_outer"`` emits unmatched PROBE rows (interval columns
    NULL) once the interval side's watermark passes the probe's cell —
    the streaming outer-join contract: the null row is delayed until
    Spark can prove no future interval can match. Because each probe maps
    to exactly ONE cell, an unmatched probe emits exactly one null row
    (no per-cell duplicates).
    """
    step_us = int(bucket_seconds) * 1_000_000
    p = probe.withWatermark(ts_col, watermark).withColumn(
        "__cell", F.expr(f"unix_micros(cast({ts_col} as timestamp)) div {step_us}")
    )
    i = (
        intervals.withWatermark(start_col, watermark)
        .withColumn(
            "__cell",
            F.explode(
                F.sequence(
                    F.expr(f"unix_micros(cast({start_col} as timestamp)) div {step_us}"),
                    F.expr(f"unix_micros(cast({end_col} as timestamp)) div {step_us}"),
                )
            ),
        )
    )
    return p.join(
        i,
        (p["__cell"] == i["__cell"])
        & (p[ts_col] >= i[start_col])
        & (p[ts_col] <= i[end_col]),
        how,
    ).drop("__cell")


def run_to_memory(stream_df: DataFrame, name: str, output_mode: str = "complete") -> DataFrame:
    """Drive a streaming DataFrame to completion against the current files
    (memory sink + processAllAvailable) and return the materialized result.
    Test/driver harness — production sinks are kafka/parquet/foreachBatch."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return stream_df.sparkSession.table(name)


def minhash_signature_array(
    text: Column, n: int = 3, num_hashes: int = 64, seed: int = 42
) -> Column:
    """MinHash signature as ONE map-side array Column — bit-identical to
    the batch ``operators.dedup.minhash_signatures`` groupBy form (same
    base hash, same affine permutations; min over the distinct shingle
    set equals min over the multiset), but with zero aggregation, so it
    runs inside a streaming SELECT.

    Inlining discipline: the shingle->hash array is the AGGREGATE'S input
    argument (evaluated once per row); the merge lambda's ``h`` is a
    bound value, so the K permutations never re-evaluate the shingle
    chain (the measured 64x re-shingle trap of naive per-permutation
    ``transform`` formulations)."""
    from etl_cascalog_spark.operators.dedup import _MERSENNE, _perm_params
    from etl_cascalog_spark.operators.text import (
        shingles_from_tokens,
        whitespace_tokens,
    )

    params = _perm_params(num_hashes, seed)
    a_arr = F.array(*[F.lit(a).cast("long") for a, _ in params])
    b_arr = F.array(*[F.lit(b).cast("long") for _, b in params])
    harr = F.transform(
        shingles_from_tokens(whitespace_tokens(text), n),
        lambda s: F.xxhash64(s).bitwiseAND(F.lit((1 << 32) - 1)),
    )
    init = F.array_repeat(F.lit(_MERSENNE).cast("long"), num_hashes)
    return F.aggregate(
        harr,
        init,
        lambda acc, h: F.zip_with(
            acc,
            F.zip_with(a_arr, b_arr, lambda a, b: (a * h + b) % F.lit(_MERSENNE)),
            lambda x, y: F.least(x, y),
        ),
    )


def neardup_against_corpus(
    stream: DataFrame,
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.7,
    seed: int = 42,
) -> DataFrame:
    """Continuous MinHash+LSH NEAR-dedup of a document stream against a
    static curated corpus — the near-dup tier next to
    :func:`dedup_against_corpus`'s exact tier: every arriving doc is
    signed map-side (:func:`minhash_signature_array`), exploded into its
    LSH band buckets, stream-static joined to the corpus's banded bucket
    table, and exact-Jaccard verified against the corpus shingle arrays
    — all inside one streaming plan (two stream-static joins, zero
    streaming aggregation).

    Returns (``id_col`` [stream side], ``corpus_id``, ``jaccard``) for
    verified pairs >= threshold; duplicates across matching bands are
    dropped with ``dropDuplicates`` (unbounded state — production
    queries should key it within a watermark or tolerate per-band
    duplicates and dedup downstream).

    100 TB posture: the static side is the corpus's (band, bucket,
    id) table + per-doc shingle arrays — both precomputed once and
    stored in production (plain columns, parquet beside the corpus; here
    derived inline). The stream side's per-doc work is pure Column
    algebra; both joins key on (band, bucket) / corpus id, so each
    micro-batch shuffles only its own rows against the bucketed corpus.
    """
    from etl_cascalog_spark.operators.dedup import (
        minhash_signatures,
        shingle_arrays,
    )
    from etl_cascalog_spark.operators.text import (
        shingles_from_tokens,
        whitespace_tokens,
    )

    rows = num_hashes // bands
    # ONE stream lineage end-to-end (two stream-STATIC joins; a second
    # derivation of the stream would make the verification join
    # stream-stream, which append mode rejects without event-time bounds).
    # The raw text column rides through the band explode — it is plain
    # bytes (no recompute, unlike a shingle array pass-through, which
    # would re-evaluate the shingle chain once per exploded band row);
    # shingles are derived at verification time, once per candidate.
    base = stream.select(
        F.col(id_col),
        F.col(text_col).alias("__text"),
        minhash_signature_array(F.col(text_col), n, num_hashes, seed).alias("__sig"),
    ).where(F.size(whitespace_tokens(F.col("__text"))) >= n)
    band_structs = F.array(
        *[
            F.struct(
                F.lit(bi).alias("band"),
                F.xxhash64(
                    *[F.col("__sig")[bi * rows + r] for r in range(rows)]
                ).alias("bh"),
            )
            for bi in range(bands)
        ]
    )
    s_banded = base.select(
        F.col(id_col), "__text", F.explode(band_structs).alias("b")
    ).select(id_col, "__text", F.col("b.band").alias("band"), F.col("b.bh").alias("bh"))

    c_sigs = minhash_signatures(corpus, id_col, text_col, n, num_hashes, seed)
    c_band_structs = F.array(
        *[
            F.struct(
                F.lit(bi).alias("band"),
                F.xxhash64(
                    *[F.col(f"mh_{bi * rows + r}") for r in range(rows)]
                ).alias("bh"),
            )
            for bi in range(bands)
        ]
    )
    c_banded = c_sigs.select(
        F.col("doc").alias("corpus_id"), F.explode(c_band_structs).alias("b")
    ).select("corpus_id", F.col("b.band").alias("band"), F.col("b.bh").alias("bh"))
    c_shingles = shingle_arrays(corpus, id_col, text_col, n).toDF(
        "corpus_id", "sh_h"
    )

    cand = s_banded.join(c_banded, on=["band", "bh"]).select(
        id_col, "__text", "corpus_id"
    )
    sh_n = shingles_from_tokens(whitespace_tokens(F.col("__text")), n)
    common = F.size(F.array_intersect(sh_n, F.col("sh_h")))
    union = F.size(sh_n) + F.size(F.col("sh_h")) - common
    j = common.cast("double") / union.cast("double")
    return (
        cand.join(c_shingles, on="corpus_id")
        .where(j >= threshold)
        .select(id_col, "corpus_id", F.round(j, 4).alias("jaccard"))
        .dropDuplicates([id_col, "corpus_id"])
    )
