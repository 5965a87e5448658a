"""Bucketed co-located joins and skew salting (the fact⋈fact scale kit).

Two techniques the 100 TB plan notes elsewhere reference:

- :func:`write_bucketed` / :func:`bucketed_join_ready` — persist both
  fact tables bucketed (and sorted) by the join key. A later join reads
  bucket i of each side into the same task: **no Exchange, no Sort** in
  the plan — the shuffle was paid once at write time and amortized over
  every subsequent join. ``tests/test_bucketed_join.py`` asserts the
  exchange-free plan.
- :func:`salted_join` — for skewed build keys: explode the hot side's
  rows into S salt replicas and scatter the probe side uniformly, so one
  hot key spreads over S tasks instead of one straggler. AQE's skew-join
  splitting (enabled in ``session.RUNTIME_CONFS``) handles this
  adaptively for sort-merge joins; the explicit salt is for the cases
  AQE can't see (aggregation feeding a join, or a deliberately
  pre-partitioned layout).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 8,
) -> None:
    """Persist as a bucketed+sorted managed table (Hive-compatible layout).

    Bucket count is a layout contract: both sides of a co-located join
    must use the same ``n_buckets`` on the same key.
    """
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
        .saveAsTable(table_name)
    )


def bucketed_join_ready(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Join two same-bucketed tables — compiles with zero Exchange nodes."""
    return spark.table(left_table).join(spark.table(right_table), key)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    n_salts: int = 8,
) -> DataFrame:
    """Skew-resistant equi-join: replicate right, scatter left over salts.

    Left (large, skewed) rows get a deterministic salt from a secondary
    column hash; right rows are replicated across all S salts. The join
    key becomes (key, salt), so a key carrying 30% of the table fans out
    over S tasks. Replication multiplies the right side by S — use only
    when right is the smaller input.
    """
    left_s = left.withColumn(
        "__salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))
    )
    right_s = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return left_s.join(right_s, [key, "__salt"]).drop("__salt")
