"""Live Structured Streaming path: availableNow batch-of-stream equals the
batch plan, and a checkpointed re-run ingests nothing (R15/R16)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from reddit_data_engineering_project_spark.streaming.runner import (
    run_tumbling_stream,
)
from reddit_data_engineering_project_spark.tables import table

from conftest import SF_DIR


def test_stream_equals_batch_and_rerun_is_noop(spark, tmp_path):
    src = os.path.join(str(tmp_path), "src")
    sink = os.path.join(str(tmp_path), "sink")
    ckpt = os.path.join(str(tmp_path), "ckpt")

    events = table(spark, SF_DIR, "events").select(
        "event_id",
        "ts",
        "event_type",
        F.coalesce(F.col("value"), F.lit(0.0)).alias("value"),
    )
    # Two source files → at least two micro-batches under maxFilesPerTrigger=1.
    events.repartition(2).write.parquet(src)

    run_tumbling_stream(spark, src, sink, ckpt)
    streamed = spark.read.option("recursiveFileLookup", True).parquet(sink)

    batch = (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type",
                "n_events", "total_value")
    )
    # availableNow + append mode: with watermarking, only windows at or
    # below the final watermark are emitted; every emitted row must match
    # the batch plan exactly, and most windows (all but the last hour)
    # must have been emitted.
    diff = streamed.exceptAll(batch)
    assert diff.count() == 0
    assert streamed.count() >= batch.count() - 25  # last-watermark holdback

    n_before = streamed.count()
    run_tumbling_stream(spark, src, sink, ckpt)  # checkpointed re-run
    n_after = (
        spark.read.option("recursiveFileLookup", True).parquet(sink).count()
    )
    assert n_after == n_before  # nothing re-ingested: idempotent catch-up


def test_session_stream_equals_batch_sessionization(spark, tmp_path):
    """Live session windows: every emitted session matches the batch
    sessionization exactly (same 30-min gap, same aggregates)."""
    from reddit_data_engineering_project_spark.streaming.runner import (
        run_session_stream,
    )

    src = os.path.join(str(tmp_path), "src")
    sink = os.path.join(str(tmp_path), "sink")
    ckpt = os.path.join(str(tmp_path), "ckpt")

    events = table(spark, SF_DIR, "events").select("user_id", "ts", "value")
    events.repartition(2).write.parquet(src)

    run_session_stream(spark, src, sink, ckpt)
    streamed = spark.read.option("recursiveFileLookup", True).parquet(sink)

    batch = (
        events.withColumn("value", F.coalesce(F.col("value"), F.lit(0.0)))
        .groupBy(
            F.session_window("ts", "30 minutes").alias("w"), "user_id"
        )
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("session_value"),
        )
        .select(
            "user_id", "session_start", "session_end",
            "n_events", "session_value",
        )
    )
    # Append mode emits only watermark-closed sessions; all emitted rows
    # must be exact batch sessions, and nearly all sessions close.
    assert streamed.exceptAll(batch).count() == 0
    assert streamed.count() > 0
    assert streamed.count() >= batch.count() * 0.8

    n_before = streamed.count()
    run_session_stream(spark, src, sink, ckpt)  # checkpointed re-run
    n_after = (
        spark.read.option("recursiveFileLookup", True).parquet(sink).count()
    )
    assert n_after == n_before


def test_topk_stream_equals_batch_leaderboard(spark, tmp_path):
    """run_topk_stream: per-batch ranks over finalized windows must equal
    the batch s07 leaderboard for every window the stream emitted, and a
    checkpointed re-run ingests nothing."""
    from reddit_data_engineering_project_spark import registry
    from reddit_data_engineering_project_spark.streaming.runner import (
        run_topk_stream,
    )

    registry.load_all_operators()
    QUERIES = registry.QUERIES

    src = os.path.join(str(tmp_path), "src")
    sink = os.path.join(str(tmp_path), "sink")
    ckpt = os.path.join(str(tmp_path), "ckpt")

    events = table(spark, SF_DIR, "events")
    events.repartition(2).write.parquet(src)

    run_topk_stream(spark, src, sink, ckpt)
    streamed = spark.read.option("recursiveFileLookup", True).parquet(sink)
    assert streamed.count() > 0

    batch = QUERIES["s07_windowed_topk"](spark, SF_DIR)
    emitted_windows = streamed.select("window_start").distinct()
    batch_emitted = batch.join(emitted_windows, "window_start")
    # exact row parity on every finalized window the stream produced
    cols = ["window_start", "user_id", "n_events", "cents", "rank"]
    assert (
        streamed.select(*cols).exceptAll(batch_emitted.select(*cols)).count()
        == 0
    )
    assert (
        batch_emitted.select(*cols).exceptAll(streamed.select(*cols)).count()
        == 0
    )

    # checkpointed re-run: no new input → sink unchanged
    before = streamed.count()
    run_topk_stream(spark, src, sink, ckpt)
    after = (
        spark.read.option("recursiveFileLookup", True).parquet(sink).count()
    )
    assert after == before
