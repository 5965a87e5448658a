"""Streaming exactly-once ingest dedup via ``dropDuplicatesWithinWatermark``.

The at-least-once delivery shape every event collector produces:
retries re-send the same ``event_id`` seconds-to-minutes later, possibly
landing in a LATER micro-batch. Plain ``dropDuplicates`` on a stream
keeps unbounded state; ``dropDuplicatesWithinWatermark`` bounds state to
the watermark horizon — the correct production primitive for "retries
arrive within N minutes" contracts (state for an id is dropped once the
watermark passes its event time + delay, so the store never grows past
one horizon's worth of ids).

Covered here (the one Structured Streaming dedup primitive the engine's
streaming surface did not yet exercise):

1. duplicates INSIDE one micro-batch are collapsed,
2. duplicates ACROSS micro-batches within the watermark horizon are
   collapsed (the retry case a per-batch ``dropDuplicates`` in
   ``foreachBatch`` misses),
3. the output is exactly the batch ``dropDuplicates`` answer on ids,
4. a checkpointed re-run is a no-op (exactly-once across restarts).

File-per-micro-batch via ``maxFilesPerTrigger=1`` + ``availableNow``
makes batch boundaries deterministic (the s08/EventTimeTimeout
technique).
"""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import Row, functions as F

from reddit_data_engineering_project_spark.session import ensure_session_confs

T0 = dt.datetime(2024, 6, 1, 12, 0, 0)


def _rows(spec):
    """spec: (event_id, minute_offset, value)."""
    return [
        Row(
            event_id=e,
            ts=T0 + dt.timedelta(minutes=m),
            user_id=1,
            value=float(v),
        )
        for e, m, v in spec
    ]


def test_dropdup_within_watermark_across_batches(spark, tmp_path):
    ensure_session_confs(spark)
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    # Batch file 0: ids 1..4, with id 2 duplicated IN-batch.
    f0 = _rows([(1, 0, 1.0), (2, 1, 2.0), (2, 1, 2.0), (3, 2, 3.0),
                (4, 3, 4.0)])
    # Batch file 1: ids 2 and 4 re-delivered minutes later (retries,
    # inside the 30-min horizon) + fresh ids 5, 6.
    f1 = _rows([(2, 5, 2.0), (4, 6, 4.0), (5, 7, 5.0), (6, 8, 6.0)])
    # Batch file 2: one more retry of id 5 + fresh id 7, later still.
    f2 = _rows([(5, 12, 5.0), (7, 13, 7.0)])
    for i, rows in enumerate((f0, f1, f2)):
        spark.createDataFrame(rows).coalesce(1).write.parquet(
            f"{src}/f{i}.parquet"
        )

    schema = spark.read.parquet(f"{src}/f0.parquet").schema

    def run():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/*.parquet")
            .withWatermark("ts", "30 minutes")
            .dropDuplicatesWithinWatermark(["event_id"])
        )
        (
            stream.writeStream.outputMode("append")
            .format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )

    run()
    got = spark.read.parquet(sink)

    # One row per distinct id — in-batch AND cross-batch dups collapsed.
    ids = sorted(r.event_id for r in got.collect())
    assert ids == [1, 2, 3, 4, 5, 6, 7], ids
    # First-seen wins: the survivor carries the FIRST delivery's ts.
    first_ts = {r.event_id: r.ts for r in got.collect()}
    assert first_ts[2] == T0 + dt.timedelta(minutes=1)
    assert first_ts[4] == T0 + dt.timedelta(minutes=3)
    assert first_ts[5] == T0 + dt.timedelta(minutes=7)

    # Exactly the batch dropDuplicates-on-id answer (id set equality
    # proven above; row count pins no extras).
    batch_n = (
        spark.read.parquet(f"{src}/*.parquet")
        .dropDuplicates(["event_id"])
        .count()
    )
    assert got.count() == batch_n

    # Checkpointed re-run with no new input: a no-op.
    run()
    assert spark.read.parquet(sink).count() == batch_n
