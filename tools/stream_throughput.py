"""Measured live-streaming throughput (Structured Streaming, availableNow).

The reference's only throughput figure is 100 rows/day (BASELINE.md); the
engine's streaming surface needs a measured number of its own. This tool
stages the sf events table as an N-file parquet source directory, then
runs the REAL ``run_tumbling_stream`` runner (file stream → watermark →
tumbling agg → idempotent per-batch parquet sink with checkpointing,
``maxFilesPerTrigger=1`` so every file is its own micro-batch) and
reports end-to-end rows/sec including checkpoint commits.

``--runner session`` drives ``run_session_stream`` instead — the S9
``applyInPandasWithState`` event-time-timeout sessionizer, the
stateful-heavy end of the streaming surface. Its 0-second watermark
requires the source files to arrive in event-time order (exactly the
production file-drop contract), so the session staging writes N
time-range slices sequentially instead of hash-repartitioning.
``--runner session_bucketed`` drives the key-coarsened form
(``run_session_stream_bucketed``) — identical output, per-key protocol
cost amortized over user buckets.

The session runners take an UNTIMED warm-up pass first (a ~200-row
2-file stream into a throwaway sink/checkpoint): a fresh session's
first stateful micro-batch pays ~3.5 s of python-worker imports and
JVM codegen that a long-running production stream amortizes to zero,
so the timed pass measures steady-state throughput — the same
exclude-first-touch discipline as ``bench.py``'s warm-up query.
``--cold`` skips it (the pre-r11 protocol; figures for both are in
SCALE.md).

Usage: python tools/stream_throughput.py [--sf /root/testdata/sf0.1]
           [--files 8] [--runner tumbling|session|session_bucketed]
           [--cold]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from reddit_data_engineering_project_spark.session import get_spark  # noqa: E402
from reddit_data_engineering_project_spark.streaming.runner import (  # noqa: E402
    run_tumbling_stream,
)
from reddit_data_engineering_project_spark.tables import table  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--files", type=int, default=8)
    ap.add_argument(
        "--runner",
        choices=(
            "tumbling",
            "session",
            "session_bucketed",
            "zscore",
            "zscore_bucketed",
        ),
        default="tumbling",
    )
    ap.add_argument(
        "--cold",
        action="store_true",
        help="skip the untimed warm-up pass (measure first-touch cost too)",
    )
    args = ap.parse_args()

    spark = get_spark(app_name="stream_throughput")
    events = table(spark, args.sf, "events")
    n_rows = events.count()

    tmp = tempfile.mkdtemp(prefix="streamtp_")
    src = os.path.join(tmp, "src")
    sink = os.path.join(tmp, "sink")
    ckpt = os.path.join(tmp, "ckpt")
    try:
        if args.runner != "tumbling":
            from pyspark.sql import Window, functions as F

            from reddit_data_engineering_project_spark.streaming.stateful import (  # noqa: E501
                run_session_stream,
                run_session_stream_bucketed,
                run_zscore_stream,
                run_zscore_stream_bucketed,
            )

            # Event-time-ordered staging: the sessionizer's 0 s
            # watermark treats any event older than the max seen as
            # late, so files must arrive in time order (the production
            # file-drop contract). Sequential writes keep mtime order
            # for the file stream's listing.
            slice_col = F.ntile(args.files).over(
                Window.orderBy(F.col("ts").asc_nulls_first(), "event_id")
            )
            staged = events.withColumn("slice", slice_col).persist()
            staged.count()
            for i in range(1, args.files + 1):
                staged.filter(F.col("slice") == i).drop(
                    "slice"
                ).coalesce(1).write.mode("append").parquet(src)
            staged.unpersist()
            runner_fn = {
                "session": run_session_stream,
                "session_bucketed": run_session_stream_bucketed,
                "zscore": run_zscore_stream,
                "zscore_bucketed": run_zscore_stream_bucketed,
            }[args.runner]
            metric = f"stream_{args.runner}_rows_per_sec"
            if not args.cold:
                # Untimed warm-up on a tiny 2-file prefix: imports +
                # codegen, throwaway state/sink. Files must land in
                # event-time order (the 0 s-watermark contract), so the
                # 200-row head is written as two sequential time slices.
                warm = os.path.join(tmp, "warm")
                head = events.orderBy(
                    F.col("ts").asc_nulls_first(), "event_id"
                ).limit(200).collect()
                for rows in (head[:100], head[100:]):
                    spark.createDataFrame(
                        rows, schema=events.schema
                    ).coalesce(1).write.mode("append").parquet(
                        warm + "/src"
                    )
                runner_fn(
                    spark, warm + "/src", warm + "/sink", warm + "/ckpt"
                )
            t0 = time.time()
            runner_fn(spark, src, sink, ckpt)
            wall = time.time() - t0
        else:
            events.repartition(args.files).write.mode("overwrite").parquet(
                src
            )
            if not args.cold:
                # Same exclude-first-touch discipline as the stateful
                # runners: the first streaming agg in a fresh session
                # pays JVM codegen + state-store init a production
                # stream amortizes to zero.
                warm = os.path.join(tmp, "warm")
                events.limit(200).repartition(2).write.parquet(
                    warm + "/src"
                )
                run_tumbling_stream(
                    spark, warm + "/src", warm + "/sink", warm + "/ckpt"
                )
            t0 = time.time()
            run_tumbling_stream(spark, src, sink, ckpt)
            wall = time.time() - t0
            metric = "stream_tumbling_rows_per_sec"
        out_rows = spark.read.parquet(os.path.join(sink, "batch=*")).count()
        print(
            json.dumps(
                {
                    "metric": metric,
                    "value": round(n_rows / wall, 1),
                    "unit": "rows/sec",
                    "input_rows": n_rows,
                    "micro_batches": args.files,
                    "wall_sec": round(wall, 2),
                    "output_rows": out_rows,
                }
            )
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
