"""Invariants of x04_sequence_packing (concat-and-chunk training prep)."""

from __future__ import annotations

from pyspark.sql import functions as F

from reddit_data_engineering_project_spark.operators.text_analysis import (
    x04_sequence_packing,
)

SF_DIR = "/root/testdata/sf0.001"
BUDGET = 2048


def test_packing_invariants(spark):
    df = x04_sequence_packing(spark, SF_DIR).cache()
    try:
        # every offset inside the budget
        assert df.filter(
            (F.col("bin_offset") < 0) | (F.col("bin_offset") >= BUDGET)
        ).count() == 0
        # per shard: token stream is contiguous — start of each doc equals
        # cumulative tokens of all earlier docs, so bin_id*budget+offset
        # recovers the running sum exactly.
        recon = df.withColumn(
            "start", F.col("bin_id") * BUDGET + F.col("bin_offset")
        )
        from pyspark.sql import Window

        w = (
            Window.partitionBy("shard")
            .orderBy("doc_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        expect = (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias(
            "expect"
        )
        bad = recon.select("start", expect).filter(
            F.col("start") != F.col("expect")
        )
        assert bad.count() == 0
        # every doc appears exactly once
        total = df.count()
        assert df.select("doc_id").distinct().count() == total
    finally:
        df.unpersist()
