"""Measured skew-join evidence: one hot key vs three physical strategies.

SCALE.md asserts the skew story (AQE skew-split first, ``salted_join`` for
the residual single-hot-key case); this harness MEASURES it on a
synthetic-but-realistic shape so the claim is numbers, not prose:

- fact: ``--rows`` rows (default 20M) where a configurable share (default
  50%) carries ONE hot key and the rest are uniform over 100k keys;
- dim: one row per key (100k rows) — dim-like but forced past the
  broadcast threshold to simulate "dim too big to broadcast" at 100 TB.

Scenarios, all joining fact⋈dim on the key with broadcast disabled:

  smj_plain    AQE off             → classic straggler: the hot key's
                                     entire fact share lands in ONE task
  aqe_skew     AQE + skewJoin on   → runtime split of the hot partition
  salted       AQE off, salted_join(salt=16) → manual explode-salt fix
  broadcast    broadcast(dim) reference floor (what AQE would pick if the
               dim fit the threshold)

Each scenario runs twice and takes the min (page-cache / JIT warm-up);
every scenario's row count is asserted identical to the fact count before
timing is trusted. Output: one JSON line per scenario + a summary line.

Usage::

    python tools/skew_stress.py [--rows 20000000] [--hot-share 0.5]
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from etl_cascalog_spark.operators.joins import salted_join  # noqa: E402

N_KEYS = 100_000


def build_inputs(spark: SparkSession, base: Path, rows: int, hot_share: float):
    """Write fact/dim parquet once so every scenario reads identical bytes."""
    fact = spark.range(rows).select(
        F.when(
            F.pmod(F.hash(F.col("id")), F.lit(1_000_000))
            < F.lit(int(hot_share * 1_000_000)),
            F.lit(0),
        )
        .otherwise(F.pmod(F.hash(F.col("id"), F.lit(7)), F.lit(N_KEYS)))
        .cast("long")
        .alias("k"),
        F.col("id").alias("payload"),
    )
    fact.write.mode("overwrite").parquet(str(base / "fact"))
    dim = spark.range(N_KEYS).select(
        F.col("id").alias("k"), (F.col("id") * 31).alias("dim_payload")
    )
    dim.write.mode("overwrite").parquet(str(base / "dim"))


def run_scenario(spark, base: Path, name: str, rows: int) -> float:
    fact = spark.read.parquet(str(base / "fact"))
    dim = spark.read.parquet(str(base / "dim"))
    if name == "salted":
        joined = salted_join(fact, dim, "k", salt=16)
    elif name == "broadcast":
        joined = fact.join(F.broadcast(dim), "k")
    else:
        joined = fact.join(dim, "k")
    t0 = time.monotonic()
    n = joined.select(
        F.count("*").alias("n"), F.sum("dim_payload").alias("chk")
    ).collect()[0]
    wall = time.monotonic() - t0
    assert n.n == rows, f"{name}: {n.n} != {rows}"
    return wall


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=20_000_000)
    ap.add_argument("--hot-share", type=float, default=0.5)
    ap.add_argument("--samples", type=int, default=2)
    args = ap.parse_args()

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    base = Path(tempfile.mkdtemp(prefix="skew_stress_"))
    try:
        build_inputs(spark, base, args.rows, args.hot_share)

        # (name, aqe_on). Broadcast disabled for all but the reference floor
        # so the join is a real shuffle join, as it is when the dim side is
        # TB-scale. skewJoin rides the AQE master switch.
        scenarios = [
            ("smj_plain", False),
            ("aqe_skew", True),
            ("salted", False),
            ("broadcast", False),
        ]
        results = {}
        for name, aqe in scenarios:
            spark.conf.set("spark.sql.adaptive.enabled", str(aqe).lower())
            spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(aqe).lower())
            spark.conf.set(
                "spark.sql.autoBroadcastJoinThreshold",
                "10485760" if name == "broadcast" else "-1",
            )
            walls = [
                run_scenario(spark, base, name, args.rows)
                for _ in range(args.samples)
            ]
            results[name] = round(min(walls), 3)
            print(json.dumps({"scenario": name, "wall_sec": results[name],
                              "samples": [round(w, 3) for w in walls]}))
        print(json.dumps({
            "rows": args.rows,
            "hot_share": args.hot_share,
            "results": results,
            "speedup_aqe_vs_plain": round(results["smj_plain"] / results["aqe_skew"], 2),
            "speedup_salted_vs_plain": round(results["smj_plain"] / results["salted"], 2),
        }))
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
