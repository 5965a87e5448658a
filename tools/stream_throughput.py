"""Measured live-streaming throughput (Structured Streaming, availableNow).

The reference's only throughput figure is 100 rows/day (BASELINE.md); the
engine's streaming surface needs a measured number of its own. This tool
stages the sf events table as an N-file parquet source directory, then
runs the REAL ``run_tumbling_stream`` runner (file stream → watermark →
tumbling agg → idempotent per-batch parquet sink with checkpointing,
``maxFilesPerTrigger=1`` so every file is its own micro-batch) and
reports end-to-end rows/sec including checkpoint commits.

Usage: python tools/stream_throughput.py [--sf /root/testdata/sf0.1] [--files 8]
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
    args = ap.parse_args()

    spark = get_spark(app_name="stream_throughput")
    events = table(spark, args.sf, "events")
    n_rows = events.count()

    tmp = tempfile.mkdtemp(prefix="streamtp_")
    src = os.path.join(tmp, "src")
    sink = os.path.join(tmp, "sink")
    ckpt = os.path.join(tmp, "ckpt")
    try:
        events.repartition(args.files).write.mode("overwrite").parquet(src)
        t0 = time.time()
        run_tumbling_stream(spark, src, sink, ckpt)
        wall = time.time() - t0
        out_rows = spark.read.parquet(os.path.join(sink, "batch=*")).count()
        print(
            json.dumps(
                {
                    "metric": "stream_tumbling_rows_per_sec",
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
