"""Small-files compaction: many slivers in, few right-sized files out,
bytes identical, and the swap is all-or-nothing (no mixed directory)."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from reddit_data_engineering_project_spark.operators.sinks import (
    compact_partition,
)
from reddit_data_engineering_project_spark.tables import table

from conftest import SF_DIR


def test_compaction_shrinks_files_preserves_rows(spark, tmp_path):
    path = os.path.join(str(tmp_path), "day")
    events = table(spark, SF_DIR, "events").select(
        "event_id", "ts", "event_type",
        F.coalesce(F.col("value"), F.lit(0.0)).alias("value"),
    )
    # Simulate micro-batch accretion: 20 sliver files.
    events.repartition(20).write.parquet(path)
    before_files = glob.glob(os.path.join(path, "*.parquet"))
    assert len(before_files) == 20
    before = events.orderBy("event_id").collect()

    n_files = compact_partition(spark, path, target_rows_per_file=10**9)

    after_files = glob.glob(os.path.join(path, "*.parquet"))
    assert len(after_files) == n_files == 1
    after = spark.read.parquet(path).orderBy("event_id").collect()
    assert after == before
    # No leftover temp/old directories from the swap.
    assert not glob.glob(os.path.join(str(tmp_path), "day__*"))
