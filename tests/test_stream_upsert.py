"""Live streaming upsert: per-micro-batch merge keeps one row per key even
when the same keys arrive again with corrections — and a fresh-checkpoint
re-delivery of every file still creates zero duplicates (R16, live form)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from reddit_data_engineering_project_spark.streaming.runner import (
    run_upsert_stream,
)
from reddit_data_engineering_project_spark.tables import table

from conftest import SF_DIR


def test_stream_upsert_no_duplicates_across_batches(spark, tmp_path):
    src = os.path.join(str(tmp_path), "src")
    target = os.path.join(str(tmp_path), "target")
    ckpt1 = os.path.join(str(tmp_path), "ckpt1")
    ckpt2 = os.path.join(str(tmp_path), "ckpt2")

    base = table(spark, SF_DIR, "events").select(
        "event_id",
        "ts",
        "event_type",
        F.coalesce(F.col("value"), F.lit(0.0)).alias("value"),
        F.to_date("ts").alias("ds"),
        F.lit(1).alias("ingest_version"),
    )
    corrections = base.withColumn("value", F.col("value") * 2.0).withColumn(
        "ingest_version", F.lit(2)
    )
    # Separate files → separate micro-batches under maxFilesPerTrigger=1,
    # in whatever order the source lists them; keep-latest by version must
    # produce the corrected rows regardless of delivery order.
    base.coalesce(1).write.mode("append").parquet(src)
    corrections.coalesce(1).write.mode("append").parquet(src)

    run_upsert_stream(
        spark, src, target, ckpt1,
        keys=["event_id"], recency_col="ingest_version", partition_col="ds",
    )
    merged = spark.read.parquet(target)
    n_keys = base.count()
    assert merged.count() == n_keys  # one row per key, both files ingested
    assert merged.filter(F.col("ingest_version") != 2).count() == 0

    # Fresh checkpoint: every file is re-delivered. The merge layer alone
    # must keep the table duplicate-free (the reference's literal claim).
    run_upsert_stream(
        spark, src, target, ckpt2,
        keys=["event_id"], recency_col="ingest_version", partition_col="ds",
    )
    again = spark.read.parquet(target)
    assert again.count() == n_keys
    assert again.filter(F.col("ingest_version") != 2).count() == 0
