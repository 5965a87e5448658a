"""Streaming statistics maintenance: per-micro-batch mergeable stats.

Drives ``run_profile_stream`` end-to-end over the documents corpus
staged as N files (one micro-batch each): the merged profile from the
streamed stats table must equal the whole-corpus recompute, and a
checkpointed re-run must not change the stats (idempotent catch-up).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from reddit_data_engineering_project_spark.operators.profile import (
    merged_profile,
)
from reddit_data_engineering_project_spark.streaming.runner import (
    run_profile_stream,
)
from reddit_data_engineering_project_spark.tables import table

from conftest import SF_DIR


def test_streamed_profile_matches_recompute(spark, tmp_path):
    wh = str(tmp_path / "wh")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS sprof LOCATION '{wh}'")
    docs = table(spark, SF_DIR, "documents")

    source = str(tmp_path / "incoming")
    ckpt = str(tmp_path / "ckpt")
    docs.repartition(4).write.mode("overwrite").parquet(source)

    run_profile_stream(spark, source, "sprof.stats", ckpt)

    got = {
        r["source"]: r
        for r in merged_profile(spark, "sprof.stats").collect()
    }
    want = {
        r["source"]: r
        for r in docs.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
            F.countDistinct("doc_id").alias("n_distinct_ids"),
        )
        .collect()
    }
    assert set(got) == set(want)
    for src, w in want.items():
        g = got[src]
        assert g["n_docs"] == w["n_docs"]
        assert g["total_chars"] == w["total_chars"]
        assert g["min_chars"] == w["min_chars"]
        assert g["max_chars"] == w["max_chars"]
        assert g["n_distinct_ids"] == w["n_distinct_ids"]

    # Idempotent catch-up: with the checkpoint retained, a second
    # availableNow pass ingests nothing and the stats are unchanged.
    before = spark.table("sprof.stats").count()
    run_profile_stream(spark, source, "sprof.stats", ckpt)
    assert spark.table("sprof.stats").count() == before
