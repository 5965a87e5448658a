"""ensure_min_parallelism contract: widen a too-narrow scan, and — the
scale-path guarantee — change NOTHING when the input is already parallel."""

from __future__ import annotations

from reddit_data_engineering_project_spark.tables import (
    ensure_min_parallelism,
    table,
)

from conftest import SF_DIR


def test_narrow_scan_is_widened(spark):
    docs = table(spark, SF_DIR, "documents")
    assert docs.rdd.getNumPartitions() == 1  # single-row-group parquet
    widened = ensure_min_parallelism(docs)
    assert (
        widened.rdd.getNumPartitions()
        == spark.sparkContext.defaultParallelism
    )


def test_already_parallel_input_is_untouched(spark):
    target = spark.sparkContext.defaultParallelism
    wide = table(spark, SF_DIR, "events").repartition(target + 2)
    out = ensure_min_parallelism(wide)
    # Same object, same plan: no repartition node was appended.
    assert out is wide
