"""Custom stateful streaming operator via ``applyInPandasWithState``.

The S5 state-store surface generalized: arbitrary per-key state the
built-in operators can't express. The demo operator maintains a per-user
running profile (event count, value sum, last-seen timestamp) across
micro-batches — the online-feature-store shape.

``tests/test_stateful_stream.py`` drives it live: two availableNow passes
over a growing file source prove state persists across restarts via the
checkpoint, and the final profile equals the batch groupBy.

Scale notes: state is partitioned by the grouping key across executors
(RocksDB-backed in production configs); each micro-batch touches only
keys present in that batch. The pandas state function receives an
iterator of per-key frames — O(batch) memory, never O(state).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

#: Per-user profile state: (n_events, total_value, last_ts-as-epoch-µs).
STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("last_ts_us", LongType()),
    ]
)

PROFILE_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("last_ts", TimestampType()),
    ]
)


def update_user_profile(
    key: tuple,
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold this micro-batch's events into the user's running profile."""
    (user_id,) = key
    if state.exists:
        n, total, last_us = state.get
    else:
        n, total, last_us = 0, 0.0, 0

    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].fillna(0.0).sum())
        ts_us = pdf["ts"].astype("int64") // 1000  # ns -> µs
        last_us = max(last_us, int(ts_us.max()))

    state.update((n, total, last_us))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "total_value": [total],
            "last_ts": [pd.Timestamp(last_us * 1000)],
        }
    )


def run_profile_stream(
    spark, source_dir: str, sink_dir: str, checkpoint_dir: str
) -> None:
    """File stream → per-user stateful profile → parquet (update mode).

    One ``availableNow`` pass; re-running with the same checkpoint
    resumes the state store, so profiles accumulate across runs exactly
    like a continuously-running query.
    """
    from ..session import ensure_session_confs

    ensure_session_confs(spark)
    schema = spark.read.parquet(source_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(source_dir)
    )
    profiles = stream.groupBy("user_id").applyInPandasWithState(
        update_user_profile,
        outputStructType=PROFILE_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

    def write_batch(batch_df, batch_id: int) -> None:
        batch_df.write.mode("append").parquet(
            f"{sink_dir}/batch={batch_id}"
        )

    (
        profiles.writeStream.outputMode("update")
        .foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
