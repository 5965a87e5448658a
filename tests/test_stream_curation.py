"""Streaming curation: the batch chain applied verbatim to a file stream.

``curation.curate`` is stateless narrow transformations only (no
aggregation, no watermark, no state store), so the IDENTICAL function
must produce the IDENTICAL result through Structured Streaming. This is
the unified-batch/stream contract a 100 TB pipeline relies on: curation
runs inline on the ingest stream, not as a separate batch rewrite.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from reddit_data_engineering_project_spark.operators.curation import curate
from conftest import SF_DIR


def test_stream_curation_equals_batch(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "source", "text"
    )
    batch_out = {tuple(r) for r in curate(docs).collect()}
    assert batch_out  # the gate keeps some docs even at sf0.001

    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    # two source files so availableNow runs >1 micro-batch
    docs.filter(F.col("doc_id") % 2 == 0).write.parquet(
        os.path.join(src, "part=0")
    )
    docs.filter(F.col("doc_id") % 2 == 1).write.parquet(
        os.path.join(src, "part=1")
    )

    schema = docs.schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    curated = curate(stream)
    assert curated.isStreaming

    q = (
        curated.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    stream_out = {tuple(r) for r in spark.read.parquet(sink).collect()}
    assert stream_out == batch_out

    # idempotent catch-up: re-running against the same checkpoint with no
    # new source files ingests nothing
    q2 = (
        curate(stream)
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    assert {tuple(r) for r in spark.read.parquet(sink).collect()} == batch_out
