"""True Structured Streaming execution path (S1-S5 live form).

``tests/test_streaming_runner.py`` drives this end-to-end: parquet file
source → event-time windowed aggregation with watermark → parquet sink
via ``foreachBatch``, one ``trigger(availableNow=True)`` pass — the
daily-batch-of-stream shape the reference's Airflow ``@daily`` schedule
implies (reference ``dags/reddit_dag.py:23``, SURVEY §1.4).

``availableNow`` processes the source's current contents in bounded
micro-batches then stops: the idempotent catch-up/backfill trigger. With
the checkpoint retained, a re-run ingests nothing new — the streaming
rendering of R16 idempotency.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..session import ensure_session_confs


def run_tumbling_stream(
    spark: SparkSession,
    source_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    window: str = "1 hour",
    watermark: str = "1 hour",
) -> None:
    """File-source stream → watermarked tumbling agg → parquet sink.

    The aggregation expression is byte-identical to
    ``s01_tumbling_window``'s batch plan — the engine guarantee under
    test is batch/stream semantic equivalence.
    """
    ensure_session_confs(spark)
    schema = spark.read.parquet(source_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(source_dir)
    )
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("append").parquet(
            os.path.join(sink_dir, f"batch={batch_id}")
        )

    (
        agg.writeStream.outputMode("append")
        .foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
