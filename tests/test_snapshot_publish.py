"""Atomic snapshot publish: readers always see one complete version."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from reddit_data_engineering_project_spark.operators.sinks import (
    publish_snapshot,
    read_snapshot,
)
from reddit_data_engineering_project_spark.tables import table

from conftest import SF_DIR


def test_publish_then_read_roundtrip(spark, tmp_path):
    root = str(tmp_path / "lake")
    os.makedirs(root)
    docs = table(spark, SF_DIR, "documents").select("doc_id", "n_chars")

    publish_snapshot(docs.filter(F.col("doc_id") < 100), root)
    assert read_snapshot(spark, root).count() == 100

    # Re-publish a larger snapshot: the pointer flips atomically and the
    # new read sees ONLY the new version (no mixing with old files).
    publish_snapshot(docs, root)
    got = read_snapshot(spark, root)
    assert got.count() == docs.count()
    assert sorted(got.columns) == ["doc_id", "n_chars"]


def test_old_snapshot_survives_republish(spark, tmp_path):
    root = str(tmp_path / "lake2")
    os.makedirs(root)
    docs = table(spark, SF_DIR, "documents").select("doc_id")

    first = publish_snapshot(docs.filter(F.col("doc_id") < 50), root)
    # A long-running reader that resolved the pointer BEFORE the
    # re-publish keeps a consistent view: the old directory is intact.
    publish_snapshot(docs, root)
    assert spark.read.parquet(first).count() == 50
    assert read_snapshot(spark, root).count() == docs.count()


def test_vacuum_reclaims_only_unreferenced(spark, tmp_path):
    from reddit_data_engineering_project_spark.operators.sinks import (
        vacuum_snapshots,
    )

    root = str(tmp_path / "lake3")
    os.makedirs(root)
    docs = table(spark, SF_DIR, "documents").select("doc_id")

    old = publish_snapshot(docs.filter(F.col("doc_id") < 50), root)
    current = publish_snapshot(docs, root)

    deleted = vacuum_snapshots(root)
    assert deleted == [old]
    assert os.path.isdir(current)
    assert read_snapshot(spark, root).count() == docs.count()
    # Idempotent: nothing left to reclaim.
    assert vacuum_snapshots(root) == []
