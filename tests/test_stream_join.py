"""Live watermarked stream-stream join under availableNow: every emitted
row must match the batch interval join (s06's semantics, streaming form)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from reddit_data_engineering_project_spark.session import ensure_session_confs
from reddit_data_engineering_project_spark.tables import table

from conftest import SF_DIR


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    ensure_session_confs(spark)
    src_p = os.path.join(str(tmp_path), "purchases")
    src_c = os.path.join(str(tmp_path), "clicks")
    sink = os.path.join(str(tmp_path), "sink")
    ckpt = os.path.join(str(tmp_path), "ckpt")

    ev = table(spark, SF_DIR, "events").select(
        "event_id",
        "ts",
        "user_id",
        "event_type",
        F.coalesce(F.col("value"), F.lit(0.0)).alias("value"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    purchases.coalesce(1).write.parquet(src_p)
    clicks.coalesce(1).write.parquet(src_c)

    sp = spark.readStream.schema(
        spark.read.parquet(src_p).schema
    ).parquet(src_p).withWatermark("p_ts", "1 hour")
    sc = spark.readStream.schema(
        spark.read.parquet(src_c).schema
    ).parquet(src_c).withWatermark("c_ts", "2 hours")

    joined = sp.join(
        sc,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOURS")),
        "inner",
    ).select("purchase_id", "click_id", "p_user")

    (
        joined.writeStream.outputMode("append")
        .format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    streamed = spark.read.parquet(sink)

    batch = purchases.join(
        clicks,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOURS")),
        "inner",
    ).select("purchase_id", "click_id", "p_user")

    # Append-mode stream-stream join holds back rows near the final
    # watermark; everything emitted must be correct, and coverage must be
    # essentially complete for this bounded input.
    assert streamed.exceptAll(batch).count() == 0
    assert streamed.count() >= int(batch.count() * 0.9)
    assert streamed.count() > 0
