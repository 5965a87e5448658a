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

from ..registry import register


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


@register(
    "q10_join_salted_skew",
    oracle="""
    WITH stats AS (
        SELECT user_id,
               count(*) AS user_n,
               sum(value) / count(*) AS user_avg
        FROM events
        GROUP BY user_id
    )
    SELECT
        e.event_type,
        count(*) AS n_events,
        count(*) FILTER (e.value > s.user_avg) AS n_above_user_avg,
        round(sum(e.value), 2) AS total_value
    FROM events e JOIN stats s ON e.user_id = s.user_id
    GROUP BY e.event_type
    """,
    tags=("join", "Q10", "skew"),
)
def q10_join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10h: fact⋈fact join under explicit skew salting, salt-invariant.

    Enriches event rows with their user's lifetime stats — the
    fact⋈aggregate self-join shape where, at 100 TB, the right side
    (hundreds of millions of users) is NOT broadcastable and a handful
    of bot/whale users can put 30% of the left side on one key. The join
    runs through :func:`salted_join`: the aggregate side is replicated
    across 8 salts, event rows scatter by a row hash, so a hot key fans
    out over 8 tasks. Results are provably salt-invariant (the salt
    never reaches the aggregation), which is exactly what the oracle's
    plain unsalted join checks.

    This synthetic corpus is deliberately uniform — the entry pins the
    *machinery* (plan shape + result invariance); AQE's skew splitting
    (on in session confs) covers the adaptive case for sort-merge joins.
    """
    from ..tables import table

    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_type", "value"
    )
    stats = ev.groupBy("user_id").agg(
        F.count("*").alias("user_n"),
        (F.sum("value") / F.count("*")).alias("user_avg"),
    )
    joined = salted_join(ev, stats, "user_id", n_salts=8)
    return joined.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.count(F.when(F.col("value") > F.col("user_avg"), 1)).alias(
            "n_above_user_avg"
        ),
        F.round(F.sum("value"), 2).alias("total_value"),
    )
