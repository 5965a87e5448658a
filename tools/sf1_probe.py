"""One decade up: sf1 walls for the suite's top cost centers (r16
verdict item 6).

The bench has read sf0.1 for sixteen rounds; every scale claim above it
was plan-asserted or measured on a single family's replicated curve.
This tool builds a GENUINE 10x-of-sf0.1 corpus on disk and times the
ten most expensive registered entries (driver r16 per-query mins)
through the exact ``queries()`` callables with bench.py's noop-write
materialization, so the sf0.1 -> sf1 ratio is an apples-to-apples
measurement of the committed plans.

Corpus construction (honest shapes, same disciplines as
``tools/scale_curve.py``):

- ``documents`` x10: rotation-permutation replicas (`translate` over a
  10-letter alphabet, replica 0 = identity) with ``doc_id`` offset by
  ``r * 100_000_000`` — each replica keeps its planted near-dup
  structure while cross-replica shingle overlap is destroyed, so
  near-dup DENSITY stays constant as size scales (naive replication
  would make every doc a 10-way near-dup and quadratically distort the
  x02 verification stage). ``n_chars`` stays consistent (rotation
  preserves length); lang/source pass through.
- ``lineitem`` + ``part`` x10: DISJOINT graph replicas — ``l_orderkey``
  offset by ``r * 1_000_000_000`` and ``l_partkey``/``p_partkey`` by
  ``r * 1_000_000``, so the co-purchase graph becomes 10 disconnected
  copies: nodes x10, degree distribution UNCHANGED (offsetting only
  orderkeys would instead densify every part's neighborhood 10x — a
  different, dishonest workload).
- every other table copied verbatim (none of the probed entries reads
  them at a scaled size).

Usage:
    python tools/sf1_probe.py [--sf /root/testdata/sf0.1]
        [--out /tmp/sf1_corpus] [--repeats 2] [--skip-build]

Prints one JSON line per (entry, sf) with the min wall over repeats,
then a summary table with the sf1/sf0.1 ratio. Paste into SCALE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from reddit_data_engineering_project_spark.session import get_spark  # noqa: E402

#: Driver r16's ten most expensive per-query mins at sf0.1.
COST_CENTERS = (
    "x02_simhash16_neardup",
    "x02_simhash_neardup",
    "x02_dedup_clusters",
    "x02_dedup_keep_best",
    "pipeline_dedup_report",
    "pipeline_split_leakage_audit",
    "q21_copurchase_reach2",
    "x05_byte_histogram",
    "q21_kcore_peel",
    "q21_triangle_count",
)

_ALPHABET = "aeiounrstl"  # same rotation alphabet as scale_curve.py
_TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def build_sf1(spark, sf_dir: str, out: str, multiplier: int = 10) -> None:
    os.makedirs(out, exist_ok=True)

    def dst(name: str) -> str:
        return os.path.join(out, f"{name}.parquet")

    # documents: rotation replicas (near-dup density constant)
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    reps = []
    for r in range(multiplier):
        rotated = _ALPHABET[r:] + _ALPHABET[:r]
        reps.append(
            docs.select(
                (F.col("doc_id") + F.lit(r * 100_000_000)).alias("doc_id"),
                F.translate(F.col("text"), _ALPHABET, rotated).alias("text"),
                "lang",
                "source",
                "n_chars",
            )
        )
    big_docs = reps[0]
    for df in reps[1:]:
        big_docs = big_docs.unionAll(df)
    big_docs.coalesce(8).write.mode("overwrite").parquet(dst("documents"))

    # lineitem + part: disjoint graph replicas (degree unchanged)
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    li_reps = []
    for r in range(multiplier):
        li_reps.append(
            li.withColumn(
                "l_orderkey", F.col("l_orderkey") + F.lit(r * 1_000_000_000)
            ).withColumn(
                "l_partkey", F.col("l_partkey") + F.lit(r * 1_000_000)
            )
        )
    big_li = li_reps[0]
    for df in li_reps[1:]:
        big_li = big_li.unionAll(df)
    big_li.coalesce(16).write.mode("overwrite").parquet(dst("lineitem"))

    part = spark.read.parquet(os.path.join(sf_dir, "part.parquet"))
    p_reps = []
    for r in range(multiplier):
        p_reps.append(
            part.withColumn(
                "p_partkey", F.col("p_partkey") + F.lit(r * 1_000_000)
            )
        )
    big_p = p_reps[0]
    for df in p_reps[1:]:
        big_p = big_p.unionAll(df)
    big_p.coalesce(4).write.mode("overwrite").parquet(dst("part"))

    # everything else verbatim (file copy; tables.table accepts both a
    # single parquet file and a directory of that name)
    for name in _TABLES:
        if name in ("documents", "lineitem", "part"):
            continue
        shutil.copyfile(
            os.path.join(sf_dir, f"{name}.parquet"), dst(name)
        )


def measure(spark, queries, name: str, sf_dir: str, repeats: int) -> float:
    best = float("inf")
    for _ in range(repeats):
        spark.catalog.clearCache()
        t0 = time.time()
        queries[name](spark, sf_dir).write.mode("overwrite").format(
            "noop"
        ).save()
        best = min(best, time.time() - t0)
    return best


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/sf1_corpus")
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument(
        "--skip-build",
        action="store_true",
        help="reuse an existing --out corpus",
    )
    args = ap.parse_args()

    from reddit_data_engineering_project_spark import registry

    registry.load_all_operators()
    queries = registry.QUERIES

    spark = get_spark(app_name="sf1_probe")
    if not args.skip_build:
        t0 = time.time()
        build_sf1(spark, args.sf, args.out)
        print(
            json.dumps({"built": args.out, "secs": round(time.time() - t0, 1)})
        )

    # warm the JIT/codegen on the small corpus first, as bench.py's
    # interleaving does implicitly
    results = {}
    for name in COST_CENTERS:
        w01 = measure(spark, queries, name, args.sf, args.repeats)
        w1 = measure(spark, queries, name, args.out, args.repeats)
        results[name] = (w01, w1)
        print(
            json.dumps(
                {
                    "entry": name,
                    "sf0.1_min_s": round(w01, 2),
                    "sf1_min_s": round(w1, 2),
                    "ratio": round(w1 / w01, 2) if w01 > 0 else None,
                }
            ),
            flush=True,
        )
    print("\n| entry | sf0.1 min (s) | sf1 min (s) | ratio |")
    print("|---|---|---|---|")
    for name, (w01, w1) in results.items():
        print(f"| {name} | {w01:.2f} | {w1:.2f} | {w1 / w01:.2f}x |")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
