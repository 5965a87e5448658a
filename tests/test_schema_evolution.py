"""Additive schema evolution through the parquet sink/read cycle.

A long-lived lake accretes files across schema versions: v1 files lack
columns that v2 files carry. The read contract (`read_evolving_parquet`)
must present one unified schema, NULL-back-fill the old files, and keep
predicate pushdown working on the common columns.
"""

from __future__ import annotations

import pathlib

from pyspark.sql import functions as F

from reddit_data_engineering_project_spark.operators.sinks import (
    read_evolving_parquet,
)
from reddit_data_engineering_project_spark.tables import table

from conftest import SF_DIR


from conftest import plan_of as _plan


def test_merged_read_unifies_versions(spark, tmp_path: pathlib.Path):
    lake = str(tmp_path / "lake")
    docs = table(spark, SF_DIR, "documents")
    v1 = docs.filter(F.col("doc_id") % 2 == 0).select("doc_id", "lang")
    v2 = (
        docs.filter(F.col("doc_id") % 2 == 1)
        .select("doc_id", "lang", "n_chars")
        .withColumn("quality_score", F.lit(0.5))
    )
    v1.write.parquet(lake + "/batch=v1")
    v2.write.parquet(lake + "/batch=v2")

    merged = read_evolving_parquet(spark, lake)

    # Unified wide schema over both vintages.
    assert set(merged.columns) >= {
        "doc_id",
        "lang",
        "n_chars",
        "quality_score",
    }
    n_total = docs.count()
    assert merged.count() == n_total

    # Old files NULL-back-fill the new columns; new files carry values.
    old_rows = merged.filter(F.col("doc_id") % 2 == 0)
    new_rows = merged.filter(F.col("doc_id") % 2 == 1)
    assert old_rows.filter(F.col("quality_score").isNotNull()).count() == 0
    assert new_rows.filter(F.col("quality_score").isNull()).count() == 0

    # Values on common columns survive unchanged.
    want_langs = {
        (r.doc_id, r.lang) for r in docs.select("doc_id", "lang").collect()
    }
    got_langs = {
        (r.doc_id, r.lang) for r in merged.select("doc_id", "lang").collect()
    }
    assert got_langs == want_langs


def test_pushdown_survives_merged_schema(spark, tmp_path: pathlib.Path):
    lake = str(tmp_path / "lake2")
    docs = table(spark, SF_DIR, "documents")
    docs.select("doc_id", "lang").write.parquet(lake + "/batch=v1")
    docs.select("doc_id", "lang", "n_chars").write.parquet(lake + "/batch=v2")

    merged = read_evolving_parquet(spark, lake).filter(F.col("doc_id") < 10)
    plan = _plan(spark, merged)
    assert "PushedFilters" in plan and "doc_id" in plan.split("PushedFilters")[1][:200], plan
