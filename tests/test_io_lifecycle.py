"""Sink lifecycle tests: atomic publish (S11/S12) and dynamic-partition
full refresh (I5) — the reference's rename-swap and ranged-DELETE patterns
over parquet directories."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_publish_atomic_swap(spark):
    from etl_cascalog_spark.io import publish_atomic

    with tempfile.TemporaryDirectory() as tmp:
        target = os.path.join(tmp, "ods_table")
        v1 = spark.range(10).withColumn("v", F.lit("one"))
        publish_atomic(v1, target)
        assert spark.read.parquet(target).count() == 10

        v2 = spark.range(25).withColumn("v", F.lit("two"))
        publish_atomic(v2, target)
        got = spark.read.parquet(target)
        assert got.count() == 25
        assert got.select("v").distinct().collect()[0].v == "two"
        # symlink layout: the live link + exactly ONE version dir — no
        # leftover staging/backup dirs or stale versions
        entries = sorted(os.listdir(tmp))
        assert entries[0] == "ods_table" and os.path.islink(target)
        assert len(entries) == 2 and entries[1].startswith("ods_table.v")


def test_publish_crash_recovery(spark):
    """The documented mid-swap crash window (real-dir → symlink conversion):
    a crash after ``final → .old`` leaves no live path; recover_publish
    restores it, and the next publish converges to the symlink layout with
    no further window."""
    from etl_cascalog_spark.io import publish_atomic, recover_publish

    with tempfile.TemporaryDirectory() as tmp:
        target = os.path.join(tmp, "ods_table")
        # legacy layout: table exists as a REAL directory
        spark.range(10).withColumn("v", F.lit("one")).write.parquet(target)

        # simulate the crash: final renamed to .old, new version never linked
        os.rename(target, target + ".old")
        assert not os.path.lexists(target)
        assert recover_publish(target) is True
        assert spark.read.parquet(target).count() == 10
        assert recover_publish(target) is False  # idempotent no-op when live

        # a real publish over the recovered dir converts to symlink layout
        publish_atomic(spark.range(25).withColumn("v", F.lit("two")), target)
        assert os.path.islink(target)
        assert spark.read.parquet(target).count() == 25
        # post-conversion: the flip is a single os.replace — crash-atomic;
        # a second publish leaves exactly one live version + the link
        publish_atomic(spark.range(7).withColumn("v", F.lit("three")), target)
        assert spark.read.parquet(target).count() == 7
        versions = [d for d in os.listdir(tmp) if d.startswith("ods_table.v")]
        assert len(versions) == 1


def test_overwrite_logical_partition_idempotent(spark):
    """I5: re-running a reload for a partition replaces only that partition
    (the reference's delete-at-snapshot-key + re-append,
    m_cocacola_score_period.clj:96-101)."""
    from etl_cascalog_spark.io import overwrite_logical_partition, write_parquet

    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "report")
        base = spark.createDataFrame(
            [("2024-01", 1.0), ("2024-01", 2.0), ("2024-02", 3.0)], ["period", "v"]
        )
        write_parquet(base, path, partition_by=["period"])

        # reload 2024-02 with different data, twice (idempotence)
        reload_df = spark.createDataFrame([("2024-02", 99.0)], ["period", "v"])
        for _ in range(2):
            overwrite_logical_partition(reload_df, path, "period")

        got = spark.read.parquet(path)
        assert got.where(F.col("period") == "2024-01").count() == 2  # untouched
        feb = got.where(F.col("period") == "2024-02").collect()
        assert [r.v for r in feb] == [99.0]


def test_load_range_audit_row(spark):
    """I2: the bookkeeping row (save-and-load-rng-dt!, trgx.clj:130-164)."""
    from etl_cascalog_spark.incremental import load_range_audit
    from etl_cascalog_spark.io import read_table

    orders = read_table(spark, "/root/testdata/sf0.001", "orders")
    row = load_range_audit(orders, "o_orderdate").collect()[0]
    assert row.dw_start_dt == "1995-01-01"
    assert row.dw_ld_cnt == orders.count()
    assert row.dw_in_use == "1"


def test_ddl_rendering():
    from etl_cascalog_spark.io import (
        render_create_table_if,
        render_delete_range,
        render_truncate,
    )

    assert (
        render_create_table_if("ms.report", {"dw_dt": "CHAR(10)", "value": "NUMERIC(18,3)"})
        == "CREATE TABLE IF NOT EXISTS ms.report (dw_dt CHAR(10), value NUMERIC(18,3))"
    )
    assert render_truncate("mlin.t") == "TRUNCATE TABLE mlin.t"
    assert (
        render_delete_range("ms.report", "dw_dt", "2017-01-01", "2017-03-31")
        == "DELETE FROM ms.report WHERE dw_dt >= '2017-01-01' AND dw_dt <= '2017-03-31'"
    )
    # datetime bounds with fractional seconds are accepted too
    assert "2017-01-01 00:00:00.5" in render_delete_range(
        "t", "ts", "2017-01-01 00:00:00.5", "2017-01-02T23:59:59"
    )


def test_delete_range_rejects_non_date_bounds():
    """The range bounds are interpolated into driver-rendered SQL, so
    anything that is not plainly a date/datetime literal must raise
    instead of rendering (quote-smuggling config value, empty string,
    free-text)."""
    import pytest

    from etl_cascalog_spark.io import render_delete_range

    for bad in ("2017-01-01' OR '1'='1", "", "yesterday", "20170101", "2017-1-1"):
        with pytest.raises(ValueError, match="not a date/datetime"):
            render_delete_range("ms.report", "dw_dt", bad, "2017-03-31")
        with pytest.raises(ValueError, match="not a date/datetime"):
            render_delete_range("ms.report", "dw_dt", "2017-01-01", bad)
    # shape-valid but semantically impossible: must fail at render time,
    # not inside the target database
    for bad in ("2017-99-99", "2017-02-30", "2017-01-01 25:61:61"):
        with pytest.raises(ValueError, match="not a valid date"):
            render_delete_range("ms.report", "dw_dt", bad, "9999-12-31")
        with pytest.raises(ValueError, match="not a valid date"):
            render_delete_range("ms.report", "dw_dt", "2017-01-01", bad)


def test_report_watermark_end_to_end(spark):
    """E1 lifecycle: report → sink → watermark probe → incremental append →
    full re-run is a no-op duplicate guard (the 38-report production loop,
    m_cocacola_score_overall.clj:82-86)."""
    from etl_cascalog_spark.catalog import QUERIES
    from etl_cascalog_spark.incremental import next_load_range
    from etl_cascalog_spark.io import write_parquet

    report = QUERIES["report_pipeline"].build(spark, "/root/testdata/sf0.001")
    with tempfile.TemporaryDirectory() as tmp:
        sink = os.path.join(tmp, "ms_report")

        # initial load: everything up to a cut date
        first = report.where(F.col("dw_dt") < "1997-06-30")
        write_parquet(first, sink, partition_by=["dw_dt"])
        n_first = spark.read.parquet(sink).count()

        # watermark probe on the sink, then append only newer rows
        start, _end = next_load_range(spark.read.parquet(sink), "dw_dt")
        delta = report.where(F.col("dw_dt") >= start)
        write_parquet(delta, sink, mode="append", partition_by=["dw_dt"])

        total = spark.read.parquet(sink).count()
        assert total == report.count(), "incremental load must reconstruct the full report"
        assert total > n_first

        # re-probing after the load finds nothing new
        start2, _ = next_load_range(spark.read.parquet(sink), "dw_dt")
        assert report.where(F.col("dw_dt") >= start2).count() == 0


def test_bucketed_join_has_no_exchange(spark):
    """Co-located bucketed join (SURVEY E2 scale lever): same-bucketed
    tables join with zero Exchange — the shuffle was paid at write time."""
    import contextlib
    import io as _io

    from etl_cascalog_spark.io import read_table, write_bucketed

    orders = read_table(spark, SF_SMOKE, "orders").select("o_orderkey", "o_totalprice")
    li = read_table(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_quantity")
    try:
        write_bucketed(orders, "t_orders_b", ["o_orderkey"], n_buckets=4)
        write_bucketed(li, "t_lineitem_b", ["l_orderkey"], n_buckets=4)
        # force SortMergeJoin (else the small side just broadcasts and the
        # bucketing is moot) — with matching buckets, SMJ reads both sides
        # pre-partitioned and pre-sorted: no Exchange, no Sort
        a = spark.table("t_orders_b").hint("merge")
        b = spark.table("t_lineitem_b")
        joined = a.join(b, a.o_orderkey == b.l_orderkey)
        buf = _io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, f"bucketed join should not shuffle:\n{plan}"
        assert joined.count() == li.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def test_csv_roundtrip(spark):
    from etl_cascalog_spark.io import read_csv

    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "t.csv")
        df = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "name"])
        df.write.option("header", "true").csv(path)
        back = read_csv(spark, path, schema="id int, name string")
        assert sorted((r.id, r.name) for r in back.collect()) == [(1, "a"), (2, "b")]


def test_orc_roundtrip(spark, tmp_path):
    """S7 format breadth: ORC is a first-class columnar source/sink in
    Spark (predicate pushdown + column pruning like parquet) — a user
    switching an ORC-based lake onto this engine needs no extra code."""
    path = str(tmp_path / "t.orc")
    df = spark.createDataFrame([(1, "a", 1.5), (2, "b", 2.5)], ["id", "name", "v"])
    df.write.orc(path)
    back = spark.read.orc(path).where(F.col("id") > 1)
    assert [(r.id, r.name, r.v) for r in back.collect()] == [(2, "b", 2.5)]
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "ORC" in plan or "orc" in plan


def test_compact_small_files(spark, tmp_path):
    """Compaction rewrites a many-file dir into few files with identical
    contents, atomically (the .old backup holds the previous layout)."""
    import glob

    from etl_cascalog_spark.io import compact

    path = str(tmp_path / "frag")
    spark.range(0, 10_000).repartition(64).write.parquet(path)
    assert len(glob.glob(path + "/*.parquet")) == 64

    n = compact(spark, path, target_files=2)
    assert n == 2
    assert len(glob.glob(path + "/*.parquet")) == 2
    got = sorted(r.id for r in spark.read.parquet(path).collect())
    assert got == list(range(10_000))


def test_merge_schema_evolution(spark, tmp_path):
    """Warehouse dirs evolve: a later write adds a column; mergeSchema
    reads both generations (old rows NULL in the new column)."""
    p = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], "id long, v string").write.parquet(p)
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, v string, score double"
    ).write.mode("append").parquet(p)
    df = spark.read.option("mergeSchema", "true").parquet(p)
    rows = {r.id: (r.v, r.score) for r in df.collect()}
    assert rows == {1: ("a", None), 2: ("b", 9.5)}


def test_csv_corrupt_records_quarantined(spark, tmp_path):
    """PERMISSIVE csv ingestion: malformed rows land in _corrupt_record
    instead of failing the load (the at-scale ingestion stance: quarantine,
    don't crash)."""
    f = tmp_path / "in.csv"
    f.write_text("id,v\n1,ok\nnot_a_number,bad\n2,fine\n")
    df = (
        spark.read.option("header", "true")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .schema("id long, v string, _corrupt_record string")
        .csv(str(f))
        .cache()
    )
    good = df.where(F.col("_corrupt_record").isNull())
    bad = df.where(F.col("_corrupt_record").isNotNull())
    assert sorted(r.id for r in good.collect()) == [1, 2]
    assert bad.count() == 1


def test_jdbc_table_exists_escapes_like_wildcards(spark):
    """ADVICE r8: DatabaseMetaData.getTables treats its table-name
    argument as a LIKE pattern ('_'/'%' are wildcards), and every staged
    sink name ('{t}_stage') contains '_' — so a similarly-shaped table
    (kvXstage) must NOT make the probe report kv_stage as existing (the
    sink would then skip CREATE and fail on the missing stage). Also:
    a schema-qualified name must be honored, and a name in ANOTHER
    schema must not shadow an unqualified probe."""
    from etl_cascalog_spark.io import jdbc_execute, jdbc_table_exists

    url = "jdbc:derby:memory:etl_exists_probe;create=true"
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    jdbc_execute(spark, url, "CREATE TABLE kvXstage (k BIGINT)")
    assert jdbc_table_exists(spark, url, "kvXstage", props)
    assert not jdbc_table_exists(spark, url, "kv_stage", props)
    jdbc_execute(spark, url, "CREATE TABLE kv_stage (k BIGINT)")
    assert jdbc_table_exists(spark, url, "kv_stage", props)
    # '%' would match anything if unescaped
    assert not jdbc_table_exists(spark, url, "%", props)
    # other-schema table must not satisfy an unqualified probe (the
    # connection's current schema is pinned), but the qualified name must
    jdbc_execute(spark, url, "CREATE SCHEMA elsewhere")
    jdbc_execute(spark, url, "CREATE TABLE elsewhere.only_there (k BIGINT)")
    assert not jdbc_table_exists(spark, url, "only_there", props)
    assert jdbc_table_exists(spark, url, "elsewhere.only_there", props)


def test_jdbc_embedded_derby_round_trip(spark):
    """S1 live-JDBC integration against embedded Derby (ships inside the
    Spark distro — no network, no external DB): DDL via jdbc_execute,
    append via jdbc_append, read back via jdbc_read with a PARTITIONED
    parallel scan and predicate pushdown into the JDBC source, then the
    reference's idempotent-reload lifecycle (ranged DELETE, TRUNCATE).
    Closes the one operator the sandbox could never exercise end-to-end
    (reference tap: trgx.clj:96-108)."""
    from etl_cascalog_spark.io import (
        jdbc_append,
        jdbc_execute,
        jdbc_read,
        render_delete_range,
        render_truncate,
    )

    url = "jdbc:derby:memory:etl_s1_test;create=true"
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    # Derby has no CREATE TABLE IF NOT EXISTS — plain DDL through the same
    # driver-side statement channel render_create_table_if feeds elsewhere
    jdbc_execute(
        spark, url, "CREATE TABLE rpt (id INT NOT NULL, dt DATE, amt DOUBLE)"
    )
    src = spark.createDataFrame(
        [(i, f"2024-01-{1 + i % 28:02d}", float(i) * 1.5) for i in range(1, 101)],
        "id int, dt string, amt double",
    ).select("id", F.col("dt").cast("date").alias("dt"), "amt")
    jdbc_append(src, url, "rpt", props)

    # partitioned parallel read: 4 JDBC splits on the numeric column
    back = jdbc_read(
        spark, url, "rpt", props,
        partition_column="id", num_partitions=4, lower_bound=1, upper_bound=101,
    )
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == 100

    # predicate pushdown reaches the JDBC scan (not a post-scan Filter only)
    filtered = back.where(F.col("id") > 90).select("id", "amt")
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "GreaterThan" in plan, plan
    assert filtered.count() == 10

    # idempotent reload: ranged DELETE, re-append, then TRUNCATE
    jdbc_execute(
        spark, url, render_delete_range("rpt", "dt", "2024-01-01", "2024-01-10")
    )
    n_after_delete = jdbc_read(spark, url, "rpt", props).count()
    assert n_after_delete < 100
    jdbc_append(src.where(F.col("dt") <= "2024-01-10"), url, "rpt", props)
    assert jdbc_read(spark, url, "rpt", props).count() == 100
    jdbc_execute(spark, url, render_truncate("rpt"))
    assert jdbc_read(spark, url, "rpt", props).count() == 0


def test_seqfile_round_trip(spark, tmp_path):
    """S7 hfs-seqfile parity: (Text, Text) SequenceFile round-trip through
    the one sanctioned RDD bridge — written with N partitions, read back
    splittable, values intact."""
    from etl_cascalog_spark.io import read_seqfile, write_seqfile

    src = spark.createDataFrame(
        [(f"k{i:03d}", f"v{i}") for i in range(50)], "key string, value string"
    ).repartition(4)
    p = str(tmp_path / "seq")
    write_seqfile(src, p, "key", "value")
    back = read_seqfile(spark, p)
    assert back.rdd.getNumPartitions() >= 1
    assert {(r.key, r.value) for r in back.collect()} == {
        (f"k{i:03d}", f"v{i}") for i in range(50)
    }


def test_xml_round_trip(spark, tmp_path):
    """S7 XML tap via Spark 4's built-in xml source: typed round-trip
    (long/double/string incl. CJK + XML-escaped chars) with an explicit
    read schema — no inference pass."""
    from etl_cascalog_spark.io import read_xml, write_xml

    src = spark.createDataFrame(
        [
            (1, 3.5, "plain"),
            (2, -0.25, "escape <&> chars"),
            (3, 1e6, "中文值"),
        ],
        "id long, score double, label string",
    )
    p = str(tmp_path / "xml")
    write_xml(src, p, row_tag="rec", root_tag="recs")
    back = read_xml(
        spark, p, row_tag="rec", schema="id long, score double, label string"
    )
    assert {(r.id, r.score, r.label) for r in back.collect()} == {
        (1, 3.5, "plain"),
        (2, -0.25, "escape <&> chars"),
        (3, 1e6, "中文值"),
    }


def _register_synthetic(spark):
    from etl_cascalog_spark.sources import SyntheticEventsDataSource

    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SyntheticEventsDataSource)
    return (
        spark.read.format("synthetic_events")
        .option("n_rows", 5000)
        .option("seed", 11)
        .option("n_partitions", 4)
    )


def test_synthetic_source_deterministic_and_partitioned(spark):
    """Spark 4 Python DataSource generator (S2/S3 at scale): rows derive
    from (seed, index) inside each task — identical results across reads
    and partition counts, no driver-side materialization."""
    df = _register_synthetic(spark).load()
    assert df.count() == 5000
    assert df.rdd.getNumPartitions() == 4
    a = sorted(map(tuple, df.collect()))
    b = sorted(
        map(
            tuple,
            _register_synthetic(spark).option("n_partitions", 7).load().collect(),
        )
    )
    assert a == b  # partitioning cannot change content
    # schema + basic sanity
    assert {r.event_type for r in df.select("event_type").distinct().collect()} <= {
        "click", "view", "purchase", "error"
    }


def test_synthetic_source_filter_pushdown(spark):
    """pushFilters contract: event_id range predicates shrink the generated
    index range (observable as correct results + pruned partitions);
    unsupported predicates still apply (Spark keeps them)."""
    df = _register_synthetic(spark).load()
    got = sorted(
        r.event_id
        for r in df.where("event_id >= 4990 AND event_id < 4995").collect()
    )
    assert got == [4990, 4991, 4992, 4993, 4994]
    # type pushdown composes with residual (unsupported) filters
    rows = df.where(
        "event_type = 'click' AND event_id < 50 AND value > 0"
    ).collect()
    assert all(r.event_type == "click" and r.event_id < 50 for r in rows)
    # equality fully prunes to a single row
    one = df.where("event_id = 123").collect()
    assert len(one) == 1 and one[0].event_id == 123


def test_synthetic_source_feeds_engine_operators(spark):
    """The generated stream drops into ordinary engine operators (windowed
    aggregation) exactly like a parquet scan."""
    from etl_cascalog_spark.operators.sessions import tumbling_window
    from pyspark.sql import functions as F

    df = _register_synthetic(spark).load()
    out = tumbling_window(
        df, "ts", "1 hour", group_cols=["event_type"],
        aggs=[F.count("*").alias("n")],
    )
    total = out.agg(F.sum("n").alias("s")).collect()[0].s
    assert total == 5000


def test_zorder_write_tightens_file_spans(spark, tmp_path):
    """write_zordered: after the Morton rewrite, the average per-file span
    of BOTH dimensions is strictly tighter than a hash-scattered layout —
    i.e. predicates on either column would prune most files."""
    from pyspark.sql import functions as F

    from etl_cascalog_spark.io import read_table
    from etl_cascalog_spark.operators.layout import file_span_stats, write_zordered

    # equal-width dimensions (8 bits each): z-order only balances pruning
    # across dims of comparable cardinality — with mismatched widths the
    # top Morton bits all come from the wider dim (documented in zvalue)
    orders = read_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey",
        (F.col("o_custkey") % 256).alias("x"),
        (
            F.datediff("o_orderdate", F.lit("1992-01-01").cast("date")) % 256
        ).alias("y"),
    )
    scattered = str(tmp_path / "scattered")
    orders.repartition(16).write.parquet(scattered)
    zpath = str(tmp_path / "zordered")
    write_zordered(orders, zpath, "x", "y", bits=8, n_files=16)

    def mean_spans(path):
        stats = file_span_stats(spark.read.parquet(path), "x", "y").collect()
        xs = sum(r.x_max - r.x_min for r in stats) / len(stats)
        ys = sum(r.y_max - r.y_min for r in stats) / len(stats)
        return xs, ys, len(stats)

    sx, sy, _ = mean_spans(scattered)
    zx, zy, nz = mean_spans(zpath)
    assert nz >= 2
    # both dimensions tighten (the whole point of interleaving)
    assert zx < sx * 0.8 and zy < sy * 0.8, (zx, sx, zy, sy)
    # and content survives the rewrite
    assert spark.read.parquet(zpath).count() == orders.count()


def test_write_with_metrics_single_pass(spark, tmp_path):
    """write_with_metrics: the metrics describe exactly the written rows
    (row count + per-column nulls), produced by the write job itself."""
    from etl_cascalog_spark.io import write_with_metrics

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "c"), (4, None)], "id long, v string"
    )
    p = str(tmp_path / "observed")
    m = write_with_metrics(df, p, metric_cols=["v"])
    assert m == {"n_rows": 4, "nulls_v": 2}
    back = spark.read.parquet(p)
    assert back.count() == 4
    assert back.where("v IS NULL").count() == 2


def test_binpack_compact_rewrite_one_file_per_bin(spark, tmp_path):
    """binpack planner + rewrite round-trip: every planned bin becomes
    exactly one parquet part file, and no row is lost or duplicated."""
    from pyspark.sql import functions as F

    from etl_cascalog_spark.io import read_table
    from etl_cascalog_spark.operators.layout import binpack_plan, compact_rewrite

    ev = read_table(spark, SF_SMOKE, "events")
    rows = ev.select(
        "event_id", "event_type", F.date_format("ts", "yyyy-MM-dd").alias("file_day")
    )
    files = rows.groupBy("event_type", "file_day").agg(
        (F.lit(1024) + F.count("*") * 64).alias("bytes")
    )
    plan = binpack_plan(files, ["event_type"], "bytes", ["file_day"], target_bytes=8192)
    out = str(tmp_path / "compacted")
    compact_rewrite(rows, plan, ["event_type"], ["file_day"], out)

    import glob

    n_bins = plan.select("event_type", "bin_id").distinct().count()
    part_files = glob.glob(f"{out}/event_type=*/bin_id=*/part-*.parquet")
    bin_dirs = {p.rsplit("/", 1)[0] for p in part_files}
    assert len(bin_dirs) == n_bins
    assert len(part_files) == n_bins, "one part file per bin"

    back = spark.read.parquet(out)
    assert back.count() == rows.count()
    assert back.select("event_id").distinct().count() == rows.count()


def test_compact_rewrite_refuses_partial_plan(spark, tmp_path):
    """A plan missing some (partition, file-key) keys must RAISE, not
    silently drop the uncovered rows on the overwrite (ADVICE r3)."""
    import pytest
    from pyspark.sql import functions as F

    from etl_cascalog_spark.io import read_table
    from etl_cascalog_spark.operators.layout import binpack_plan, compact_rewrite

    ev = read_table(spark, SF_SMOKE, "events")
    rows = ev.select(
        "event_id", "event_type", F.date_format("ts", "yyyy-MM-dd").alias("file_day")
    )
    files = rows.groupBy("event_type", "file_day").agg(
        (F.lit(1024) + F.count("*") * 64).alias("bytes")
    )
    plan = binpack_plan(files, ["event_type"], "bytes", ["file_day"], target_bytes=8192)
    stale = plan.orderBy("event_type", "file_day").limit(
        plan.count() - 1
    )  # drop one key: a stale snapshot
    with pytest.raises(ValueError, match="absent from the plan"):
        compact_rewrite(rows, stale, ["event_type"], ["file_day"], str(tmp_path / "x"))


def test_portable_hash32_sql_matches_spark_on_negative_keys(spark):
    """Engine parity of the portable hash holds for SIGNED inputs too:
    DuckDB's % keeps the dividend's sign, so the SQL rendering wraps the
    first reduction into a pmod equivalent (ADVICE r3)."""
    import duckdb

    from etl_cascalog_spark.operators.sketches import (
        portable_hash32,
        portable_hash32_sql,
    )
    from pyspark.sql import functions as F

    keys = [-1, -2147483648, -4294967296, -12345678901, 0, 7, 2**31, -2148 * 1000003]
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    got = {
        r.k: r.h
        for r in df.select("k", portable_hash32(F.col("k")).alias("h")).collect()
    }
    con = duckdb.connect()
    for k in keys:
        (want,) = con.execute(
            f"SELECT {portable_hash32_sql(str(k))}"
        ).fetchone()
        assert got[k] == want, k


def test_binaryfile_wholefile_roundtrip(spark, tmp_path):
    """S7 hfs-wholefile: a directory of real PPM files flows through
    io.read_binary_files into the real multimodal codec — (path, length,
    content) contract, glob pruning of non-matching files, and decoded
    pixel stats all verified against the writer's parameters."""
    from etl_cascalog_spark.io import read_binary_files
    from etl_cascalog_spark.operators.multimodal import decode_image

    params = {i: ((i * 7) % 256, (i * 11) % 256, (i * 13) % 256, 2 + i % 3, 1 + i % 4) for i in range(9)}
    d = tmp_path / "imgs"
    d.mkdir()
    for i, (r, g, b, w, h) in params.items():
        payload = b"P6\n%d %d\n255\n" % (w, h) + bytes((r, g, b)) * (w * h)
        (d / f"img_{i}.ppm").write_bytes(payload)
    (d / "notes.md").write_text("decoy — glob must prune this")

    from pyspark.sql import functions as F

    files = read_binary_files(spark, str(d), glob="*.ppm")
    assert files.count() == len(params)  # decoy pruned at listing
    got = files.select(
        F.regexp_extract("path", r"img_(\d+)\.ppm$", 1).cast("int").alias("i"),
        "length",
        "content",
    )
    # length metadata == actual bytes written
    for row in got.select("i", "length").collect():
        r, g, b, w, h = params[row.i]
        assert row.length == 11 + 3 * w * h
    feats = {
        r.doc_id: (r.width, r.height, r.max_val)
        for r in decode_image(
            got.select(F.col("i").cast("long").alias("doc_id"), "content"),
            "doc_id",
            "content",
        ).collect()
    }
    for i, (r, g, b, w, h) in params.items():
        assert feats[i] == (w, h, 255)


def test_delete_using_range_derby_rewrite(spark):
    """Derby twin of the raw DELETE … USING reload guard (mlin:181-184):
    Derby has no USING, so dialects.render_delete_using_range_derby
    rewrites the same predicate as EXISTS — verified to delete exactly the
    rows the PG-native statement deletes in test_pg_dialect."""
    from etl_cascalog_spark.dialects import render_delete_using_range_derby
    from etl_cascalog_spark.io import jdbc_execute, jdbc_read

    url = "jdbc:derby:memory:etl_using_rng;create=true"
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    jdbc_execute(spark, url, "CREATE TABLE tgt (dw_dt CHAR(10), k INT)")
    jdbc_execute(
        spark,
        url,
        "CREATE TABLE rng (dw_start_dt CHAR(10), dw_end_dt CHAR(10), dw_in_use CHAR(1))",
    )
    for dt, k in [("2016-01-05", 1), ("2016-01-20", 2), ("2016-02-05", 3)]:
        jdbc_execute(spark, url, f"INSERT INTO tgt VALUES ('{dt}', {k})")
    jdbc_execute(spark, url, "INSERT INTO rng VALUES ('2016-01-01', '2016-01-31', '1')")
    jdbc_execute(spark, url, "INSERT INTO rng VALUES ('2016-02-01', '2016-02-28', '0')")
    jdbc_execute(spark, url, render_delete_using_range_derby("tgt", "rng"))
    # active January range deletes ks 1,2; inactive February range spares k 3
    remaining = jdbc_read(spark, url, "tgt", props).select(F.col("k").alias("k"))
    assert [r.k for r in remaining.collect()] == [3]  # Derby uppercases ids; F.col is case-insensitive


def test_jdbc_execute_prepared_binds_hostile_values(spark):
    """The PreparedStatement batch path (streaming JDBC upsert DELETE):
    values containing quotes and backslashes pass through as DATA — no
    driver-rendered literal can be broken or injected — and non-finite
    floats are rejected at bind time."""
    import pytest as _pytest

    from etl_cascalog_spark.io import jdbc_execute, jdbc_execute_prepared, jdbc_read

    url = "jdbc:derby:memory:etl_prepared;create=true"
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    jdbc_execute(spark, url, "CREATE TABLE kv (k VARCHAR(64), v INT)")
    hostile = ["plain", "o'brien", "back\\slash", "x'; DELETE FROM kv; --"]
    jdbc_execute_prepared(
        spark,
        url,
        "INSERT INTO kv VALUES (?, ?)",
        [(k, i) for i, k in enumerate(hostile)],
    )
    def _kv(df):
        return df.select(F.col("k").alias("k"), F.col("v").alias("v"))

    back = {r.k: r.v for r in _kv(jdbc_read(spark, url, "kv", props)).collect()}
    assert back == {k: i for i, k in enumerate(hostile)}
    jdbc_execute_prepared(
        spark, url, "DELETE FROM kv WHERE k = ?", [("o'brien",), ("back\\slash",)]
    )
    assert sorted(r.k for r in _kv(jdbc_read(spark, url, "kv", props)).collect()) == [
        "plain",
        "x'; DELETE FROM kv; --",
    ]
    with _pytest.raises(ValueError, match="non-finite"):
        jdbc_execute_prepared(
            spark, url, "DELETE FROM kv WHERE v = ?", [(float("nan"),)]
        )


def test_jdbc_prepared_aware_timestamp_microsecond_exact(spark):
    """Aware-datetime binds must be microsecond-EXACT arbitrarily far out:
    the old ``int(v.timestamp() * 1e6)`` float round trip is 1 us off for
    ~half of all microsecond values once epoch-us exceeds 2^53 (~year
    2255), and a keyed DELETE must hit exact instants. 2255-06-07
    08:09:10.123457 UTC is a value the float path provably misbinds
    (-> .123456)."""
    import datetime as dt

    from etl_cascalog_spark.io import jdbc_execute, jdbc_execute_prepared, jdbc_read

    utc = dt.timezone.utc
    v = dt.datetime(2255, 6, 7, 8, 9, 10, 123457, tzinfo=utc)
    exact_us = (v - dt.datetime(1970, 1, 1, tzinfo=utc)) // dt.timedelta(
        microseconds=1
    )
    assert int(v.timestamp() * 1_000_000) != exact_us  # the float bug is real

    url = "jdbc:derby:memory:etl_ts_exact;create=true"
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    jdbc_execute(spark, url, "CREATE TABLE tsx (k INT, ts TIMESTAMP)")
    jdbc_execute_prepared(spark, url, "INSERT INTO tsx VALUES (?, ?)", [(1, v)])
    (got,) = (
        jdbc_read(spark, url, "tsx", props).select(F.col("TS").alias("ts")).collect()
    )
    assert got.ts.microsecond == 123457
    assert (got.ts.second, got.ts.minute) == (10, 9)
    # the exact instant must be addressable: a keyed DELETE on it hits
    jdbc_execute_prepared(spark, url, "DELETE FROM tsx WHERE ts = ?", [(v,)])
    assert jdbc_read(spark, url, "tsx", props).count() == 0


def test_jdbc_execute_transaction_commit_and_rollback(spark):
    """The single-transaction executor for the reference's 3-way publish
    swap (trgx.clj:188-193 via dialects.render_replace_into_ods): all
    statements commit together, and a failure anywhere rolls back EVERY
    prior statement — the no-live-table crash window the reference's
    autocommitted dance left open must not exist. Exercised on embedded
    Derby with its RENAME TABLE dialect of the same swap (Derby DDL is
    transactional like PG's)."""
    import pytest

    from etl_cascalog_spark.io import (
        jdbc_execute,
        jdbc_execute_transaction,
        jdbc_read,
        jdbc_table_exists,
    )

    url = "jdbc:derby:memory:etl_txn_test;create=true"
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    jdbc_execute(spark, url, "CREATE TABLE live (v INT)")
    jdbc_execute(spark, url, "INSERT INTO live VALUES (1)")
    jdbc_execute(spark, url, "CREATE TABLE stage (v INT)")
    jdbc_execute(spark, url, "INSERT INTO stage VALUES (2)")

    # rollback: second statement fails → the DROP must be undone, the
    # old live table still present and readable
    with pytest.raises(Exception):
        jdbc_execute_transaction(
            spark,
            url,
            ["DROP TABLE live", "RENAME TABLE no_such_table TO live"],
            props,
        )
    assert jdbc_table_exists(spark, url, "live", props)
    assert jdbc_read(spark, url, "live", props).first().V == 1

    # commit: the full swap lands atomically
    jdbc_execute_transaction(
        spark,
        url,
        ["DROP TABLE live", "RENAME TABLE stage TO live"],
        props,
    )
    assert jdbc_read(spark, url, "live", props).first().V == 2
    assert not jdbc_table_exists(spark, url, "stage", props)


def test_publish_replace_into_ods_is_wired_transactional(spark, monkeypatch):
    """ADVICE r10: the engine's JDBC ODS publish path must actually route
    the rendered 3-statement swap through jdbc_execute_transaction (one
    transaction, rollback on failure) — not per-statement autocommit.
    The transaction executor itself is proven on Derby above and the PG
    swap semantics live in test_pg_dialect; here the WIRING is pinned."""
    from etl_cascalog_spark import io
    from etl_cascalog_spark.dialects import render_replace_into_ods

    captured = {}

    def fake_txn(spark_, url, statements, properties=None):
        captured["url"] = url
        captured["statements"] = statements
        captured["properties"] = properties

    monkeypatch.setattr(io, "jdbc_execute_transaction", fake_txn)
    io.publish_replace_into_ods(
        spark,
        "jdbc:postgresql://h/db",
        "d_show_tmp",
        "d_show",
        properties={"user": "ms"},
    )
    assert captured["url"] == "jdbc:postgresql://h/db"
    assert captured["statements"] == render_replace_into_ods(
        "d_show_tmp", "d_show"
    )
    assert captured["properties"] == {"user": "ms"}


def test_schema_cache_invalidates_on_rewrite(spark, tmp_path):
    """ADVICE r10: the plan-time schema cache is keyed on the path's stat
    fingerprint, so a parquet REWRITTEN at the same path with a different
    schema re-infers instead of silently reading nulls through the stale
    schema."""
    from etl_cascalog_spark.io import read_table

    sf = str(tmp_path)
    p = f"{sf}/probe.parquet"
    spark.range(3).selectExpr("id AS a").write.mode("overwrite").parquet(p)
    first = read_table(spark, sf, "probe")
    assert first.schema.simpleString() == "struct<a:bigint>"
    spark.range(3).selectExpr(
        "CAST(id AS STRING) AS a", "id * 2 AS b"
    ).write.mode("overwrite").parquet(p)
    second = read_table(spark, sf, "probe")
    assert dict(second.dtypes) == {"a": "string", "b": "bigint"}
    assert second.where(F.col("b") == 4).count() == 1
    # ADVICE r11: the superseded fingerprint is EVICTED on insert — each
    # path holds at most one cache entry, so a rewrite loop can't grow the
    # cache unboundedly or keep stale StructTypes alive
    from etl_cascalog_spark.io import _SCHEMA_CACHE

    assert sum(1 for k in _SCHEMA_CACHE if k[0] == f"{sf}/probe.parquet") == 1
