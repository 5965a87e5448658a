"""Invariant tests for the curation operators (operators/curation.py).

The oracle gate pins exact values; these tests pin the PROPERTIES that
make each op safe to run on a corpus the oracle never saw: coverage,
determinism, idempotency, and bound constraints.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from reddit_data_engineering_project_spark.operators import curation
from reddit_data_engineering_project_spark.operators.curation import (
    _CHUNK_SIZE,
    _CHUNK_STRIDE,
    _EMAIL_RE,
    _IP_RE,
    _PHONE_RE,
    _UNK_ID,
)

from conftest import SF_DIR


def test_dataset_split_partitions_every_doc_once(spark):
    out = curation.x04_dataset_split(spark, SF_DIR)
    total = out.count()
    assert total == out.select("doc_id").distinct().count()
    by_split = {
        r["split"]: r["count"] for r in out.groupBy("split").count().collect()
    }
    assert set(by_split) <= {"train", "val", "test"}
    # 80/10/10 within a loose tolerance at 50 docs (hash, not RNG).
    assert by_split.get("train", 0) / total > 0.6


def test_dataset_split_is_deterministic_under_repartition(spark):
    a = {
        (r["doc_id"], r["split"])
        for r in curation.x04_dataset_split(spark, SF_DIR).collect()
    }
    b = {
        (r["doc_id"], r["split"])
        for r in curation.x04_dataset_split(spark, SF_DIR)
        .repartition(7)
        .collect()
    }
    assert a == b


def test_chunking_covers_every_token_exactly(spark):
    """Chunk geometry: starts at stride intervals, last chunk reaches the
    final token, every chunk non-empty and <= CHUNK_SIZE."""
    rows = curation.x04_chunking(spark, SF_DIR).collect()
    assert rows
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r["chunk_idx"])
        for i, c in enumerate(chunks):
            assert c["start"] == i * _CHUNK_STRIDE
            assert 1 <= c["chunk_len"] <= _CHUNK_SIZE
        last = chunks[-1]
        n_tokens = last["start"] + last["chunk_len"]
        # every chunk except the last must be full-size OR reach the end
        for c in chunks[:-1]:
            assert c["start"] + c["chunk_len"] >= min(
                c["start"] + _CHUNK_SIZE, n_tokens
            )
        # the next start would fall past the end: no missing tail chunk
        assert last["start"] + _CHUNK_STRIDE >= n_tokens


def test_pii_scrub_redaction_is_complete_and_idempotent(spark):
    out = curation.x04_pii_scrub(spark, SF_DIR)
    # every doc got its planted PII detected
    bad = out.filter(
        (F.col("n_emails") < 1) | (F.col("n_phones") < 1) | (F.col("n_ips") < 1)
    ).count()
    assert bad == 0
    # rebuild the redacted text the same way the op does and assert no
    # residual matches — i.e. redaction removed everything it counts
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    aug = docs.select(
        F.concat(
            F.col("text"),
            F.lit(" contact "),
            F.col("source"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com phone 555-01"),
            F.lpad((F.col("doc_id") % 100).cast("string"), 2, "0"),
            F.lit(" ip 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".1"),
        ).alias("text")
    )
    red = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), _EMAIL_RE, "<EMAIL>"),
            _PHONE_RE,
            "<PHONE>",
        ),
        _IP_RE,
        "<IP>",
    )
    residual = (
        aug.select(red.alias("red"))
        .filter(
            (F.size(F.regexp_extract_all(F.col("red"), F.lit(_EMAIL_RE), F.lit(0))) > 0)
            | (F.size(F.regexp_extract_all(F.col("red"), F.lit(_PHONE_RE), F.lit(0))) > 0)
            | (F.size(F.regexp_extract_all(F.col("red"), F.lit(_IP_RE), F.lit(0))) > 0)
        )
        .count()
    )
    assert residual == 0


def test_repetition_fractions_are_bounded(spark):
    rows = curation.x04_repetition_metrics(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["dup_token_frac"] <= 1.0
        assert 0.0 < r["top_bigram_frac"] <= 1.0
        # the top bigram's instances are a subset of duplicated instances
        # unless it is unique (then dup can be 0)
        assert r["dup_bigram_frac"] <= 1.0
        if r["dup_bigram_frac"] > 0:
            assert r["top_bigram_frac"] <= r["dup_bigram_frac"] + 1e-9


def test_tokenizer_bounds_and_determinism(spark):
    a = curation.x04_tokenize_to_ids(spark, SF_DIR)
    rows = a.collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_unk"] <= r["n_tokens"]
    again = {
        (r["doc_id"], r["ids_md5"])
        for r in curation.x04_tokenize_to_ids(spark, SF_DIR).collect()
    }
    assert {(r["doc_id"], r["ids_md5"]) for r in rows} == again


def test_curation_pipeline_subset_of_corpus(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = curation.pipeline_curation_full(spark, SF_DIR)
    n_docs = docs.count()
    n_out = out.count()
    assert 0 < n_out < n_docs  # the repetition gate actually gates
    assert out.filter(~F.col("split").isin("train", "val", "test")).count() == 0
    assert out.filter(F.col("n_chunks") < 1).count() == 0


def test_unk_id_is_outside_vocab_range():
    assert _UNK_ID == curation._VOCAB_SIZE


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-q"]))
