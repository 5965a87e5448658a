"""Custom stateful operator live: state persists across availableNow runs
and the final per-user profile equals the batch aggregate."""

from __future__ import annotations

import os

from pyspark.sql import Window, functions as F

from reddit_data_engineering_project_spark.streaming.stateful import (
    run_profile_stream,
)
from reddit_data_engineering_project_spark.tables import table

from conftest import SF_DIR


def test_state_accumulates_across_runs(spark, tmp_path):
    src = os.path.join(str(tmp_path), "src")
    sink = os.path.join(str(tmp_path), "sink")
    ckpt = os.path.join(str(tmp_path), "ckpt")

    ev = table(spark, SF_DIR, "events").select(
        "event_id",
        "ts",
        "user_id",
        F.coalesce(F.col("value"), F.lit(0.0)).alias("value"),
    )
    half1 = ev.filter(F.col("event_id") % 2 == 0)
    half2 = ev.filter(F.col("event_id") % 2 == 1)

    # Run 1: first half of the stream arrives.
    half1.coalesce(1).write.mode("append").parquet(src)
    run_profile_stream(spark, src, sink, ckpt)
    # Run 2: more files land; checkpointed restart folds them into state.
    half2.coalesce(1).write.mode("append").parquet(src)
    run_profile_stream(spark, src, sink, ckpt)

    out = spark.read.option("recursiveFileLookup", True).parquet(sink)
    # Latest emitted profile per user (update mode emits one per batch).
    w = Window.partitionBy("user_id").orderBy(
        F.col("n_events").desc(), F.col("last_ts").desc()
    )
    final = (
        out.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "n_events", "total_value", "last_ts")
    )
    expected = ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.sum("value").alias("total_value"),
        F.max("ts").alias("last_ts"),
    )
    joined = final.alias("f").join(expected.alias("e"), "user_id")
    mismatches = joined.filter(
        (F.col("f.n_events") != F.col("e.n_events"))
        | (F.abs(F.col("f.total_value") - F.col("e.total_value")) > 1e-6)
        | (F.col("f.last_ts") != F.col("e.last_ts"))
    )
    assert final.count() == expected.count()
    assert mismatches.count() == 0
