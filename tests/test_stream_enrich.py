"""Stream-static join: streamed enrichment equals the batch join, row for
row, and unmatched fact rows survive (left join, no state store)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from reddit_data_engineering_project_spark.streaming.runner import (
    run_enrich_stream,
)
from reddit_data_engineering_project_spark.tables import table

from conftest import SF_DIR


def test_stream_static_join_equals_batch(spark, tmp_path):
    src = os.path.join(str(tmp_path), "src")
    sink = os.path.join(str(tmp_path), "sink")
    ckpt = os.path.join(str(tmp_path), "ckpt")

    events = table(spark, SF_DIR, "events").select(
        "event_id", "ts", "event_type",
        F.coalesce(F.col("value"), F.lit(0.0)).alias("value"),
    )
    events.repartition(2).write.parquet(src)

    # Dim covers only SOME event types: left join must keep the rest
    # with a null category.
    dim = spark.createDataFrame(
        [("click", "engagement"), ("view", "engagement"), ("purchase", "revenue")],
        ["event_type", "category"],
    )

    run_enrich_stream(spark, src, dim, sink, ckpt, on="event_type")
    streamed = spark.read.option("recursiveFileLookup", True).parquet(sink)

    batch = events.join(F.broadcast(dim), "event_type", "left")
    assert streamed.exceptAll(batch).count() == 0
    assert batch.exceptAll(streamed).count() == 0
    # The join is genuinely left: fact types outside the dim survive.
    assert streamed.filter(F.col("category").isNull()).count() > 0
