"""Per-round benchmark entrypoint (driver contract).

Runs the registered headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced to full execution with a ``noop``-format write (all
partitions computed, nothing collected to the driver) so the timing
reflects distributed execution cost, not driver materialization. This is
deliberately the opposite of ``tools/check_oracle.py`` (which collects for
value comparison): the bench measures the plan, the oracle checks the
values.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _sf_from_dir(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entrymod
    from reddit_data_engineering_project_spark.session import get_spark

    spark = get_spark(app_name="bench")
    queries = entrymod.queries()

    timings: dict[str, float] = {}
    failures: dict[str, str] = {}
    # Warm the JVM + parquet footer caches once so q-to-q timings are not
    # dominated by first-touch JIT; the warmup query is not recorded.
    try:
        spark.read.parquet(os.path.join(sf_dir, "nation.parquet")).count()
    except Exception:
        pass

    for name in sorted(queries):
        fn = queries[name]
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            timings[name] = round(time.time() - t0, 3)
        except Exception as exc:  # keep benching the rest
            failures[name] = f"{type(exc).__name__}: {exc}"[:200]

    total = round(sum(timings.values()), 3)
    result = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": _sf_from_dir(sf_dir),
    }
    if failures:
        result["failures"] = failures
    print(json.dumps(result))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
