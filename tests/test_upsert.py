"""R16 idempotency contract: re-running an upsert never creates duplicates
(reference ``README.md:13`` — the claim, here made executable)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from reddit_data_engineering_project_spark.operators.upsert import (
    keep_latest,
    upsert_parquet,
)
from reddit_data_engineering_project_spark.tables import table

from conftest import SF_DIR


def _batch(spark):
    return table(spark, SF_DIR, "events").select(
        "event_id",
        "ts",
        "user_id",
        F.coalesce(F.col("value"), F.lit(0.0)).alias("value"),
        F.to_date(F.date_trunc("day", F.col("ts"))).alias("ds"),
    )


def test_upsert_reapply_is_noop(spark, tmp_path):
    """Apply the same batch twice -> identical table (count + checksum)."""
    target = os.path.join(str(tmp_path), "events_upsert")
    batch = _batch(spark)
    upsert_parquet(spark, batch, target, ["event_id"], "ts", "ds")
    first = spark.read.parquet(target)
    n1, s1 = first.agg(
        F.count("*"), F.sum(F.hash("event_id", "user_id", "value"))
    ).first()
    upsert_parquet(spark, batch, target, ["event_id"], "ts", "ds")
    second = spark.read.parquet(target)
    n2, s2 = second.agg(
        F.count("*"), F.sum(F.hash("event_id", "user_id", "value"))
    ).first()
    assert (n1, s1) == (n2, s2)
    assert n1 == batch.count()


def test_upsert_applies_corrections(spark, tmp_path):
    """A corrected re-run batch replaces matching keys, adds new ones."""
    target = os.path.join(str(tmp_path), "events_corrected")
    batch = _batch(spark)
    upsert_parquet(spark, batch, target, ["event_id"], "ts", "ds")
    # Correction: bump value on one existing key; one brand-new key.
    correction = batch.filter(F.col("event_id") == 0).withColumn(
        "value", F.lit(9999.0)
    ).withColumn("ts", F.col("ts") + F.expr("INTERVAL 1 HOURS"))
    new_row = batch.filter(F.col("event_id") == 1).withColumn(
        "event_id", F.lit(10_000_000).cast("long")
    )
    upsert_parquet(
        spark,
        correction.unionByName(new_row),
        target,
        ["event_id"],
        "ts",
        "ds",
    )
    result = spark.read.parquet(target)
    assert result.count() == batch.count() + 1
    assert (
        result.filter(F.col("event_id") == 0).select("value").first()[0]
        == 9999.0
    )


def test_keep_latest_single_survivor_under_ties(spark):
    df = spark.createDataFrame(
        [(1, 5, "a"), (1, 5, "b"), (2, 3, "c")], "k int, v int, tag string"
    )
    out = keep_latest(df, ["k"], [F.col("v").desc(), F.col("tag").asc()])
    rows = {r["k"]: r["tag"] for r in out.collect()}
    assert rows == {1: "a", 2: "c"}
