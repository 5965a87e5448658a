"""Invariant tests for the BPE pair census, char-entropy signal, and
product-quantized top-k (round-7 additions).

The oracle gate pins exact fixture values; these pin the semantics on
crafted inputs: pair windows stay inside token boundaries, entropy hits
closed-form values (0 for constant text, exactly 1 bit for a 50/50
alphabet), and PQ reconstruction is exact when the corpus IS the
codebook (ADC distance equals the true integer distance).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row

from reddit_data_engineering_project_spark.operators import (
    curation,
    similarity,
)

from conftest import SF_DIR


def _write_documents(spark, tmp_path, rows):
    """rows: (doc_id, text)"""
    df = spark.createDataFrame(
        [
            Row(doc_id=r[0], text=r[1], lang="en", source="s", n_chars=len(r[1]))
            for r in rows
        ]
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


def _write_embeddings(spark, tmp_path, vecs):
    """vecs: list of (vec_id, [floats])"""
    df = spark.createDataFrame(
        [Row(vec_id=i, embedding=v, label=0) for i, v in vecs]
    ).selectExpr(
        "vec_id", "CAST(embedding AS array<float>) AS embedding", "label"
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "embeddings.parquet")
    )
    return str(tmp_path)


# ----------------------------------------------------------------- BPE pairs


def test_bpe_pairs_stay_inside_token_boundaries(spark, tmp_path):
    """'ab cd' must yield pairs {ab, cd} only — never the cross-token
    'b c' window; single-char tokens contribute nothing."""
    sf = _write_documents(spark, tmp_path, [(1, "ab cd x")])
    out = curation.x04_bpe_pair_stats(spark, sf).collect()
    assert {(r.pair, r.n) for r in out} == {("ab", 1), ("cd", 1)}


def test_bpe_pairs_overlap_and_rank_ties(spark, tmp_path):
    """'aaa' has windows aa,aa (overlapping count = 2); ties rank
    lexicographically."""
    sf = _write_documents(spark, tmp_path, [(1, "aaa bb cc")])
    out = {r.pair: (r.n, r.rank) for r in curation.x04_bpe_pair_stats(spark, sf).collect()}
    assert out["aa"] == (2, 1)
    assert out["bb"] == (1, 2) and out["cc"] == (1, 3)


# ------------------------------------------------------------- char entropy


def test_entropy_zero_for_constant_text(spark, tmp_path):
    sf = _write_documents(spark, tmp_path, [(1, "aaaa")])
    r = curation.x04_char_entropy(spark, sf).collect()[0]
    assert r.n_chars_counted == 4 and r.n_distinct_chars == 1
    # sum term = round(4*log2(4)*1e6) = 8e6; H = log2(4) - 8e6/1e6/4 = 0
    assert r.entropy_e4 == 0


def test_entropy_one_bit_for_balanced_binary_alphabet(spark, tmp_path):
    sf = _write_documents(spark, tmp_path, [(1, "abab")])
    r = curation.x04_char_entropy(spark, sf).collect()[0]
    assert r.n_distinct_chars == 2
    assert r.entropy_e4 == 10000  # exactly 1 bit


def test_entropy_matches_closed_form(spark, tmp_path):
    text = "aab"
    sf = _write_documents(spark, tmp_path, [(1, text)])
    r = curation.x04_char_entropy(spark, sf).collect()[0]
    h = -(2 / 3 * math.log2(2 / 3) + 1 / 3 * math.log2(1 / 3))
    assert r.entropy_e4 == pytest.approx(round(h * 10000), abs=1)


# --------------------------------------------------------------------- PQ


def test_pq_exact_when_corpus_is_codebook(spark, tmp_path):
    """With <= 16 vectors, every vector IS a centroid: assignment picks
    itself, reconstruction is exact, and ADC distance equals the true
    integer code distance — so top-1 is the true nearest neighbor."""
    vecs = [
        (0, [1.0] * 64),
        (1, [1.0] * 32 + [-1.0] * 32),
        (2, [1.0] * 63 + [0.5]),  # closest to vec 0
        (3, [-1.0] * 64),
    ]
    sf = _write_embeddings(spark, tmp_path, vecs)
    out = similarity.x03_pq_topk(spark, sf).collect()
    top1 = {r.query_id: r.neighbor_id for r in out if r.rank == 1}
    assert top1[0] == 2  # vec 2 is nearest to vec 0
    # exact reconstruction: distance 0 never appears across distinct ids
    assert all(r.adc_dist > 0 for r in out)


def test_pq_distance_is_symmetric_integer(spark, tmp_path):
    vecs = [(i, [float(i)] * 64) for i in range(6)]
    sf = _write_embeddings(spark, tmp_path, vecs)
    out = similarity.x03_pq_topk(spark, sf).collect()
    d = {(r.query_id, r.neighbor_id): r.adc_dist for r in out}
    for (a, b), v in d.items():
        if (b, a) in d:
            assert d[(b, a)] == v
    assert all(isinstance(v, int) for v in d.values())


def test_new_ops_run_on_fixture_corpus(spark):
    assert curation.x04_bpe_pair_stats(spark, SF_DIR).count() > 0
    assert curation.x04_char_entropy(spark, SF_DIR).count() > 0
    assert similarity.x03_pq_topk(spark, SF_DIR).count() > 0
