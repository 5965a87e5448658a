"""Incremental corpus profiling via mergeable sketches.

``x04_corpus_profile`` computes a one-pass profile by rescanning the
corpus; at 100 TB a daily pipeline cannot afford that rescan. This
module maintains the profile INCREMENTALLY: each ingest batch reduces to
a handful of per-source profile rows — counts, sums, min/max envelopes,
and HyperLogLog sketches (Spark's ``hll_sketch_agg``, the Apache
DataSketches binary format) for the distinct-count fields — appended to
a stored stats table. The corpus-wide profile is then an aggregation of
the (tiny) stats table: exact fields merge by sum/min/max, distinct
fields merge by ``hll_union_agg``. No corpus rescan, ever.

Why sketches and not stored distinct sets: distinct doc_ids per source
is corpus-sized state; an HLL sketch is ~KB per (batch, source) row at
default precision with ~2% error, and union is associative+commutative,
so batches can arrive (and merge) in any order — the property that makes
the profile restartable and backfill-safe.

``tests/test_incremental_profile.py`` pins: merged == whole-corpus
recompute on every exact field, HLL estimates match exact distincts on
the fixture corpus, and appending a new batch updates the profile
without touching previous batch rows.

Reference anchor: the reference's only statistics surface is the daily
row count of its CSV output (``etls/reddit_etl.py:129``, R11); this is
that role re-expressed for a lake that cannot be rescanned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

PROFILE_COLS = (
    "batch_id",
    "source",
    "n_docs",
    "n_text_nonnull",
    "total_chars",
    "min_chars",
    "max_chars",
    "doc_id_sketch",
    "lang_sketch",
)


def batch_profile(docs: DataFrame, batch_id: int) -> DataFrame:
    """Reduce one ingest batch to per-source mergeable profile rows.

    One map-side-combined aggregate over the batch: output is
    |sources| rows regardless of batch size. Sketch columns are binary
    (DataSketches HLL); everything else is exact and merges exactly.
    """
    return docs.groupBy("source").agg(
        F.lit(batch_id).alias("batch_id"),
        F.count("*").alias("n_docs"),
        F.count("text").alias("n_text_nonnull"),
        F.sum("n_chars").alias("total_chars"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        F.hll_sketch_agg("doc_id").alias("doc_id_sketch"),
        F.hll_sketch_agg("lang").alias("lang_sketch"),
    ).select(*PROFILE_COLS)


def append_batch_profile(
    profile: DataFrame, table_name: str
) -> None:
    """Append one batch's profile rows to the stored stats table."""
    profile.write.mode("append").format("parquet").saveAsTable(table_name)


def merged_profile(spark: SparkSession, table_name: str) -> DataFrame:
    """Corpus-wide profile from the stored stats table — no corpus scan.

    Exact fields merge by sum/min/max; distinct-count fields merge by
    ``hll_union_agg`` then estimate. The input is |batches|·|sources|
    tiny rows, so this aggregation costs nothing at any corpus size.
    """
    stats = spark.table(table_name)
    return (
        stats.groupBy("source")
        .agg(
            F.sum("n_docs").alias("n_docs"),
            F.sum("n_text_nonnull").alias("n_text_nonnull"),
            F.sum("total_chars").alias("total_chars"),
            F.min("min_chars").alias("min_chars"),
            F.max("max_chars").alias("max_chars"),
            F.hll_sketch_estimate(
                F.hll_union_agg("doc_id_sketch")
            ).alias("n_distinct_ids"),
            F.hll_sketch_estimate(
                F.hll_union_agg("lang_sketch")
            ).alias("n_langs"),
        )
    )
