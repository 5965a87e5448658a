"""Persisted bucketed band index: the amortized half of incremental dedup.

Two contracts:

1. **Result parity** — incremental near-dup through the stored index
   returns exactly the pairs the recompute-everything entry
   (``x02_incremental_neardup``) returns.
2. **Plan shape** — the candidate join reads the bucketed index with NO
   Exchange above its scan: only the increment side shuffles. This is
   the 100 TB recurrence guarantee (daily cost ∝ |increment|, corpus
   index shuffled once at build time).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from reddit_data_engineering_project_spark.operators.dedup import (
    build_band_index,
    incremental_candidates_against_index,
    incremental_neardup_with_index,
)
from reddit_data_engineering_project_spark.registry import QUERIES, load_all_operators
from reddit_data_engineering_project_spark.tables import table

from conftest import SF_DIR

load_all_operators()


from conftest import plan_of as _plan


def _split(spark):
    docs = table(spark, SF_DIR, "documents")
    is_inc = F.col("doc_id") % 10 == 0
    return docs, docs.filter(is_inc), docs.filter(~is_inc)


def test_index_parity_with_recompute_path(spark, tmp_path):
    wh = os.path.join(str(tmp_path), "wh")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS band_idx LOCATION '{wh}'")
    docs, inc, corpus = _split(spark)
    build_band_index(corpus, "band_idx.corpus_bands")

    via_index = incremental_neardup_with_index(
        spark, inc, docs, "band_idx.corpus_bands"
    )
    recompute = QUERIES["x02_incremental_neardup"](spark, SF_DIR)

    got = {(r.inc_doc, r.corpus_doc) for r in via_index.collect()}
    want = {(r.inc_doc, r.corpus_doc) for r in recompute.collect()}
    assert got == want
    assert got  # planted corpus guarantees cross-side near-dups exist


def test_bucketed_index_removes_index_side_exchange(spark, tmp_path):
    wh = os.path.join(str(tmp_path), "wh2")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS band_idx2 LOCATION '{wh}'")
    _, inc, corpus = _split(spark)
    build_band_index(corpus, "band_idx2.corpus_bands")
    # Same rows, same layout, NO bucketing metadata: the control.
    spark.table("band_idx2.corpus_bands").write.mode("overwrite").format(
        "parquet"
    ).saveAsTable("band_idx2.corpus_bands_flat")

    # Force the sort-merge path so bucketed distribution matters (a
    # broadcast of the tiny test index would hide the contract).
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bucketed_plan = _plan(
            spark,
            incremental_candidates_against_index(
                spark, inc, "band_idx2.corpus_bands"
            ),
        )
        flat_plan = _plan(
            spark,
            incremental_candidates_against_index(
                spark, inc, "band_idx2.corpus_bands_flat"
            ),
        )
        # The increment side's own shuffles (signature agg, dedup) appear
        # in both plans; bucketing must remove exactly ONE Exchange — the
        # index side's — and the bucketed scan must be visible. Count the
        # "(N) Exchange" detail headers: each node appears once there
        # (the tree rendering above them would double-count).
        import re

        n_exchange = lambda p: len(re.findall(r"\(\d+\) Exchange", p))
        assert n_exchange(bucketed_plan) == n_exchange(flat_plan) - 1, (
            bucketed_plan,
            flat_plan,
        )
        assert (
            "SelectedBucketsCount" in bucketed_plan
            or "Bucketed: true" in bucketed_plan
        ), bucketed_plan
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
