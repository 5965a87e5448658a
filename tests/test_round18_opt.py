"""Round-18 optimization pins.

Focused equivalence tests for the internals this round changed:

- the codegen shingle window enumeration (arrays_zip of shifted slices)
  vs the retired interpreted transform-lambda, over hostile text shapes
  (NULL text, empty text, sub-window docs, repeated tokens, unicode);
- ``_verify_jaccard``'s shared-shingle-stream path vs the corpus-rescan
  path (identical verified pairs), plus the candidate-broadcast guard's
  fallback join (identical results with the broadcast disabled);
- the persisted co-purchase half-edge list (mirror parity, and the
  triangle entry's direct half consumption);
- the basket-derived lift aggregates (n_orders / part_orders) vs the
  retired per-aggregate fact re-shuffles;
- the bounded pair-census accumulator's flush path (partials across
  flushes must merge to the unflushed census).
"""

from __future__ import annotations

import os
import sys

import pandas as pd
import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from conftest import SF_DIR


def _rows(df):
    return sorted(map(tuple, df.collect()))


# ------------------------------------------------------------------ shingles


def _edge_docs(spark):
    return spark.createDataFrame(
        [
            (1, None),
            (2, ""),
            (3, "one"),
            (4, "one two three"),
            (5, "one two three four"),
            (6, "one two three four five six"),
            (7, "a  b   c"),  # consecutive spaces -> empty tokens
            (8, "dup dup dup dup dup"),
            (9, "émoji 🎉 Ünïcode tokens here"),
        ],
        "doc_id long, text string",
    )


@pytest.mark.parametrize("n", [4, 6])
@pytest.mark.parametrize("distinct", [False, True])
def test_shingles_matches_retired_transform_lambda(spark, n, distinct):
    from reddit_data_engineering_project_spark.operators.dedup import shingles

    docs = _edge_docs(spark)
    toks = F.split(F.col("text"), " ")
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    sh = F.transform(
        idx, lambda i: F.array_join(F.slice(toks, i + 1, n), "_")
    )
    old = docs.select("doc_id", F.explode(sh).alias("shingle"))
    if distinct:
        old = old.dropDuplicates(["doc_id", "shingle"])
    got = shingles(docs, n=n, distinct=distinct, widen=False)
    assert _rows(got) == _rows(old)


# ------------------------------------------------- verify: shared stream


def _corpus(spark):
    return (
        spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
        .select("doc_id", "text")
    )


def test_verify_jaccard_stream_path_matches_rescan_path(spark):
    from reddit_data_engineering_project_spark.operators.dedup import (
        _verify_jaccard,
        shingles,
    )

    docs = _corpus(spark)
    ids = [r.doc_id for r in docs.select("doc_id").limit(40).collect()]
    cands = spark.createDataFrame(
        [(a, b) for a, b in zip(ids[::2], ids[1::2])], "doc_a long, doc_b long"
    )
    rescan = _verify_jaccard(docs, cands)
    sh = shingles(docs, distinct=False, widen=False).persist()
    streamed = _verify_jaccard(docs, cands, sh_stream=sh)
    sh_d = shingles(docs).persist()
    streamed_d = _verify_jaccard(
        docs, cands, sh_stream=sh_d, sh_stream_distinct=True
    )
    assert _rows(streamed) == _rows(rescan)
    assert _rows(streamed_d) == _rows(rescan)
    spark.catalog.clearCache()


def test_verify_jaccard_broadcast_guard_fallback(spark, monkeypatch):
    from reddit_data_engineering_project_spark.operators import dedup

    docs = _corpus(spark)
    ids = [r.doc_id for r in docs.select("doc_id").limit(20).collect()]
    cands = spark.createDataFrame(
        [(a, b) for a, b in zip(ids[::2], ids[1::2])], "doc_a long, doc_b long"
    )
    forced = _rows(dedup._verify_jaccard(docs, cands))
    monkeypatch.setattr(dedup, "_BROADCAST_CAND_MAX_ROWS", 0)
    fallback = _rows(dedup._verify_jaccard(docs, cands))
    assert fallback == forced
    spark.catalog.clearCache()


# ------------------------------------------------------- co-purchase graph


def test_half_edges_mirror_parity(spark):
    from reddit_data_engineering_project_spark.operators import (
        product_analytics as pa,
    )

    half = pa._copurchase_half_edges(spark, SF_DIR)
    edges = pa._copurchase_edges(spark, SF_DIR)
    hrows = _rows(half)
    assert all(s < d for s, d in hrows), "half list must be src < dst"
    mirrored = sorted(hrows + [(d, s) for s, d in hrows])
    assert _rows(edges) == mirrored
    spark.catalog.clearCache()


def test_lift_basket_aggregates_match_direct_fact_aggregates(spark):
    from reddit_data_engineering_project_spark.operators import (
        product_analytics as pa,
    )
    from reddit_data_engineering_project_spark.tables import table

    li = (
        table(spark, SF_DIR, "lineitem")
        .select("l_orderkey", "l_partkey")
        .dropDuplicates(["l_orderkey", "l_partkey"])
    )
    n_direct = li.agg(F.countDistinct("l_orderkey")).collect()[0][0]
    freq_direct = _rows(
        li.groupBy("l_partkey").agg(F.count("*").alias("part_orders"))
    )
    baskets = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_list("l_partkey")).alias("parts")
    )
    n_basket = baskets.agg(F.count("*")).collect()[0][0]
    freq_basket = _rows(
        baskets.select(F.explode("parts").alias("l_partkey"))
        .groupBy("l_partkey")
        .agg(F.count("*").alias("part_orders"))
    )
    assert n_basket == n_direct
    assert freq_basket == freq_direct


# ------------------------------------------------------ pair census flush


def test_pair_census_flush_merges_to_unflushed_census(monkeypatch):
    from reddit_data_engineering_project_spark.operators import curation

    batches = [
        pd.DataFrame({"t": ["abab", "bc", "ccc"]}),
        pd.DataFrame({"t": ["abab", "dd", None]}),
        pd.DataFrame({"t": ["xy"]}),
    ]

    def census(frames):
        out: dict = {}
        for f in frames:
            for pair, pn in zip(f["pair"], f["pn"]):
                out[pair] = out.get(pair, 0) + int(pn)
        return out

    unflushed = census(curation._pair_census_partials(iter(batches)))
    monkeypatch.setattr(curation, "_PAIR_CENSUS_FLUSH_ENTRIES", 1)
    frames = list(curation._pair_census_partials(iter(batches)))
    assert len(frames) > 1, "flush threshold must have tripped"
    assert census(frames) == unflushed
