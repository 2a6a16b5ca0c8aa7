"""Synthetic 8x soak of the dedup stack beyond the provided test data.

The driver ships sf0.1 as the largest fixture; this probe replicates the
documents corpus K times IN-PLAN (union of id-offset, token-perturbed
variants — near-dup families survive, exact dups do not trivially
explode) and runs the heavy dedup paths on the result, demonstrating
headroom past the fixtures without writing outside the repo. Wall-clock
per op at 1x vs Kx is the signal: the bucketed/candidate-pruned designs
should grow sublinearly in wall on idle local[32] until cores saturate.

Usage: python tools/soak_dedup.py [K] -> one JSON line + table on stderr
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from etl_cascalog_spark.session import get_spark, scoped_storage  # noqa: E402
from etl_cascalog_spark.io import read_table  # noqa: E402

SF = "/root/testdata/sf0.1"


def replicated_docs(spark, k: int):
    base = read_table(spark, SF, "documents").select("doc_id", "text")
    n = 1_000_000  # id namespace stride per replica
    parts = [
        base.select(
            (F.col("doc_id") + i * n).alias("doc_id"),
            F.concat(F.col("text"), F.lit(f" variant{i}")).alias("text"),
        )
        for i in range(k)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    spark = get_spark("soak_dedup")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    from etl_cascalog_spark.operators.dedup import (
        connected_components,
        exact_dedup,
        minhash_lsh_pairs,
        simhash_pairs,
    )
    from etl_cascalog_spark.operators.text import duplicate_token_spans

    def run(name, fn):
        res = {}
        for mult in (1, k):
            docs = replicated_docs(spark, mult)
            t0 = time.perf_counter()
            with scoped_storage(spark):
                fn(docs).write.format("noop").mode("overwrite").save()
            res[mult] = round(time.perf_counter() - t0, 2)
        print(
            f"{name:28s} 1x={res[1]:7.2f}s  {k}x={res[k]:7.2f}s  "
            f"growth={res[k] / max(res[1], 1e-9):5.2f}x",
            file=sys.stderr,
        )
        return res

    out = {
        "exact_dedup": run("exact_dedup", lambda d: exact_dedup(d, "doc_id", "text")),
        "minhash_lsh_pairs": run(
            "minhash_lsh_pairs",
            lambda d: minhash_lsh_pairs(d, "doc_id", "text", n=3, threshold=0.7),
        ),
        "neardup_cc": run(
            "neardup_cc",
            lambda d: connected_components(
                minhash_lsh_pairs(d, "doc_id", "text", n=3, threshold=0.7)
            ),
        ),
        "simhash_pairs": run(
            "simhash_pairs",
            lambda d: simhash_pairs(d, "doc_id", "text", hash_fn="xxhash64"),
        ),
        "duplicate_token_spans": run(
            "duplicate_token_spans", lambda d: duplicate_token_spans(d, n=4)
        ),
    }
    sys.stdout.write(json.dumps({"k": k, "soak": out}) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
