"""Benchmark harness: runs the headline catalog queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``value`` is the total wall-clock over all headline queries. Each query is
driven through the ``noop`` sink (full evaluation of every output column —
a bare ``count()`` would let Catalyst prune unreferenced projection
expressions and understate projection-only queries); row counts come from an
``Observation`` on the same job, so nothing runs twice.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from etl_cascalog_spark.session import (  # noqa: E402
    get_spark,
    release_all_blocks,
    scoped_storage,
)
from etl_cascalog_spark.catalog import QUERIES  # noqa: E402


def loadavg() -> float | None:
    """1-minute host load — stamped per query so driver-vs-builder swings
    on this co-tenant box are attributable mechanically (same code, same
    day measured 0.8 s vs 1.6 s on tpch_q8; the load stamp is the
    instrument that says which run was squeezed).

    Returns None (JSON null) on non-Linux: ``float("nan")`` would make
    json.dumps emit the literal ``NaN``, which is not strict JSON and
    breaks jq / non-Python parsers (ADVICE r7)."""
    try:
        return float(open("/proc/loadavg").read().split()[0])
    except OSError:  # non-Linux fallback: absent, not fabricated
        return None


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark("etl_cascalog_spark_bench")

    # untimed warm-up: JVM/JIT + parquet footer caches, not query work
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from etl_cascalog_spark.io import read_table

    read_table(spark, sf_dir, "lineitem").limit(1).collect()
    # one tiny catalog query untimed, so whole-stage-codegen JIT of the
    # common operator stack is not billed to whichever query sorts first
    with scoped_storage(spark):
        QUERIES["static_report"].build(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    run_seq = [0]

    def run_once(name: str) -> float:
        t0 = time.perf_counter()
        # queries are independent jobs (the reference ran each report in its
        # own JVM): every cache / localCheckpoint block a query creates dies
        # at scope exit — the round-2 lesson (leaked blocks -> deterministic
        # major-GC stall mid-sweep) made structural instead of conventional.
        with scoped_storage(spark):
            df = QUERIES[name].build(spark, sf_dir)
            run_seq[0] += 1
            obs = Observation(f"rows_{name}_{run_seq[0]}")
            df.observe(obs, F.count(F.lit(1)).alias("n")).write.format(
                "noop"
            ).mode("overwrite").save()
            n = obs.get["n"]
        wall = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {wall:.3f}s ({n} rows)", file=sys.stderr)
        return wall

    # Min-of-3 with a pre-query GC for every non-trivial query. Two
    # measured lessons drove this (see SCALE.md "Bench methodology"):
    # (1) single samples on this co-tenant host swing 2-4x either way, and
    # the noise class is NOT confined to the heavy tail (round-4's
    # top-10-only median left 49 of 89 >1s queries outside 10% across two
    # back-to-back runs); (2) MEDIAN-of-3 still failed (31 of 59 outside
    # 10%) because the noise is temporally correlated — a GC-debt or
    # noisy-neighbor window covers all three back-to-back samples, so the
    # median moves with the window (a 0.6s literal-rows query measured a
    # 2.2s *median* mid-stall). The noise is strictly additive (CPU steal,
    # GC pause, page-cache miss can only ever ADD wall), so the MIN of N
    # samples is the consistent estimator of the query's true work — the
    # same reasoning timeit's docs give for repeat()+min. The untimed
    # System.gc() before each query stops the previous query's garbage
    # from being billed to this one. Sub-floor queries keep their single
    # sample: their absolute noise cannot move a >1s round-over-round
    # ratio. NOTE: min-of-3 values are systematically below the
    # single-sample artifacts of rounds <= 4; compare like with like.
    # SPARK_GRAFT_BENCH_SAMPLES=1 turns off re-sampling AND the pre-query
    # GC (smoke mode): the 0.6 s floor is tuned for sf0.1 — at sf0.001 the
    # ~0.5 s fixed per-query overhead pushes nearly every query over it,
    # tripling a run whose absolute numbers nobody reads.
    MIN_FLOOR_S = 0.6
    n_samples = int(os.environ.get("SPARK_GRAFT_BENCH_SAMPLES", "3"))
    jvm_system = spark._jvm.java.lang.System  # noqa: SLF001

    timings: dict[str, float] = {}
    query_meta: dict[str, dict] = {}
    load_start = loadavg()
    for name in sorted(QUERIES):
        if n_samples > 1:
            jvm_system.gc()
        load_q = loadavg()
        first = run_once(name)
        samples = [first]
        if n_samples > 1 and first >= MIN_FLOOR_S:
            # honor the requested N exactly (N=5 takes 5 base samples,
            # N=2 takes 2) — the knob is a sample count, not an on/off bit
            samples += [run_once(name) for _ in range(n_samples - 1)]
            # adaptive escalation: a wide 3-sample spread means a noise
            # window covered part of the triple — two more samples give
            # min() a shot at a quiet slot (bounded: only volatile
            # queries pay, typically <20% of the catalog)
            if max(samples) / max(min(samples), 1e-9) > 1.25:
                samples += [run_once(name), run_once(name)]
            timings[name] = min(samples)
            print(
                f"# {name}: min {timings[name]:.3f}s of {samples}",
                file=sys.stderr,
            )
        else:
            timings[name] = first
        query_meta[name] = {
            "n_samples": len(samples),
            "samples": samples,
            "loadavg": load_q,
        }

    release_all_blocks(spark)  # sweep epilogue: also clears SQL-cache metadata
    total = round(sum(timings.values()), 3)
    full_line = json.dumps(
        {
            "metric": "catalog_total_wall",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "sf": float(sf),
            "loadavg_start": load_start,
            "loadavg_end": loadavg(),
            "query_meta": query_meta,
        }
    )
    # Full per-query map -> committed artifact (survives any pipe handling).
    Path(__file__).resolve().parent.joinpath("BENCH_local.json").write_text(
        full_line + "\n"
    )
    # The driver keeps only the LAST 2000 chars of stdout and tries to parse
    # a JSON line out of that tail. The full 193-query line is ~4000 chars,
    # so rounds 4 and 5 recorded ``parsed: null`` — the head of the line fell
    # off the tail. Emit a compact line instead: total + as many per-query
    # timings as fit under the tail budget, slowest-first (the perf-relevant
    # ones), with an explicit pointer at the full artifact.
    # Round 13 (VERDICT r12 #8, dropped_from_bench de-noising): the same
    # 1800-char budget carries ~20% more queries with compact JSON
    # separators and 2-dp values (the full-precision map is in
    # BENCH_local.json; a 10 ms quantum is far below the >=0.3 s noise
    # band the tail window is read at). Same contract: ONE JSON line,
    # same fields, entries only ever ADDED relative to the r12 window.
    TAIL_BUDGET = 1800  # driver keeps 2000; leave headroom for framing
    _SEP = (",", ":")
    compact: dict[str, float] = {}
    base = {
        "metric": "catalog_total_wall",
        "value": total,
        "unit": "sec",
        "sf": float(sf),
        "queries_total": len(timings),
        "full": "BENCH_local.json",
    }
    for name, wall in sorted(timings.items(), key=lambda kv: -kv[1]):
        trial = dict(base, queries=dict(compact, **{name: round(wall, 2)}))
        if len(json.dumps(trial, separators=_SEP)) > TAIL_BUDGET:
            break
        compact[name] = round(wall, 2)
    line = json.dumps(dict(base, queries=compact), separators=_SEP)
    sys.stdout.write(line + "\n")
    sys.stdout.flush()
    spark.stop()


if __name__ == "__main__":
    main()
