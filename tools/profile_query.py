"""Per-query isolation profiler for the optimization rounds.

Times named registered queries with the noop sink (guide §1.4) over N
repeats and reports min/median, and optionally dumps each query's
``explain("formatted")`` to ``plans/<tag>/<name>_<suffix>.txt`` so plan
claims in OPTIMIZATION_r*.md are judge-checkable without running Spark.

Usage:
    python tools/profile_query.py --sf /root/testdata/sf0.1 \
        --repeats 3 --plans plans/r17 --suffix before \
        x02_simhash_neardup x02_dedup_clusters
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--plans", default=None, help="directory for explain dumps")
    ap.add_argument("--suffix", default="before")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from reddit_data_engineering_project_spark.session import get_spark

    spark = get_spark(app_name="profile_query")
    queries = entrymod.queries()
    # Warm the JVM/footer caches the same way bench.py does.
    spark.read.parquet(os.path.join(args.sf, "nation.parquet")).count()

    for name in args.names:
        if name not in queries:
            print(f"SKIP unknown query: {name}")
            continue
        fn = queries[name]
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            df = fn(spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
                df._jdf.queryExecution(), "formatted"
            )
            path = os.path.join(args.plans, f"{name}_{args.suffix}.txt")
            with open(path, "w") as fh:
                fh.write(plan)
            spark.catalog.clearCache()
        samples = []
        for _ in range(args.repeats):
            spark.sparkContext.setJobDescription(f"profile:{name}")
            t0 = time.time()
            fn(spark, args.sf).write.mode("overwrite").format("noop").save()
            samples.append(time.time() - t0)
            spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(None)
        srt = sorted(samples)
        print(
            f"{name:45s} min={srt[0]:7.3f}s med={srt[len(srt)//2]:7.3f}s "
            f"all={[round(s,3) for s in samples]}"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
