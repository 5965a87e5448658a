"""Invariant tests for the round-7 operators: boilerplate removal,
deterministic global shuffle, CDC changelog apply, BM25 scoring.

The oracle gate pins exact values on the fixture corpus; these tests pin
the SEMANTIC contracts on crafted inputs the fixtures cannot exhibit:
cross-doc boilerplate actually being dropped with order preserved,
tombstone/resurrection behavior in the CDC apply, bijectivity and
density of the shuffle order, and BM25's term-membership guarantee.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import Row, functions as F

from reddit_data_engineering_project_spark.operators import (
    curation,
    text_analysis,
    upsert,
)

from conftest import SF_DIR


def _write_documents(spark, tmp_path, rows):
    """Materialize a crafted documents table as an sf_dir."""
    df = spark.createDataFrame(
        [
            Row(
                doc_id=r[0],
                text=r[1],
                lang="en",
                source=r[2],
                n_chars=len(r[1]),
            )
            for r in rows
        ]
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


def _write_events(spark, tmp_path, rows):
    """Materialize a crafted events table as an sf_dir.

    rows: (event_id, ts_iso, user_id, event_type, value)
    """
    df = spark.createDataFrame(
        [
            Row(
                event_id=r[0],
                ts=r[1],
                user_id=r[2],
                event_type=r[3],
                value=float(r[4]),
                props="{}",
            )
            for r in rows
        ]
    ).withColumn("ts", F.to_timestamp("ts"))
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    return str(tmp_path)


# ---------------------------------------------------------------- boilerplate


def test_boilerplate_block_dropped_and_order_preserved(spark, tmp_path):
    """A 3-token block repeated across two docs of one source is removed
    from BOTH; the surviving text keeps its original block order."""
    boiler = "cookie banner text"
    sf = _write_documents(
        spark,
        tmp_path,
        [
            (1, f"alpha beta gamma {boiler} delta epsilon zeta", "srcA"),
            (2, f"{boiler} one two three four five six", "srcA"),
            # Same block in a DIFFERENT source: must NOT count toward
            # srcA's threshold, and survives alone in srcB.
            (3, f"{boiler} seven eight nine", "srcB"),
        ],
    )
    out = {
        r["doc_id"]: r
        for r in curation.x04_boilerplate_removal(spark, sf).collect()
    }
    # doc 1: blocks = [alpha beta gamma][cookie banner text][delta epsilon zeta]
    assert out[1]["n_blocks"] == 3 and out[1]["n_kept"] == 2
    expect_1 = hashlib.md5(
        b"alpha beta gamma delta epsilon zeta"
    ).hexdigest()
    assert out[1]["kept_md5"] == expect_1
    assert out[2]["n_kept"] == out[2]["n_blocks"] - 1
    # srcB's copy is below threshold there — everything kept.
    assert out[3]["n_kept"] == out[3]["n_blocks"]


def test_boilerplate_all_removed_doc_hashes_empty_string(spark, tmp_path):
    sf = _write_documents(
        spark,
        tmp_path,
        [
            (1, "spam spam spam", "srcA"),
            (2, "spam spam spam", "srcA"),
        ],
    )
    out = {
        r["doc_id"]: r
        for r in curation.x04_boilerplate_removal(spark, sf).collect()
    }
    empty_md5 = hashlib.md5(b"").hexdigest()
    for doc_id in (1, 2):
        assert out[doc_id]["n_kept"] == 0
        assert out[doc_id]["kept_md5"] == empty_md5


# -------------------------------------------------------------- global shuffle


def test_global_shuffle_positions_dense_and_hash_bijective(spark):
    out = curation.x04_global_shuffle(spark, SF_DIR).collect()
    assert len(out) > 0
    assert len({r["order_hash"] for r in out}) == len(out)  # bijective
    by_shard: dict[int, list] = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r)
    for shard, rows in by_shard.items():
        positions = sorted(r["position"] for r in rows)
        assert positions == list(range(1, len(rows) + 1))
        # position order == order_hash order within the shard
        ranked = sorted(rows, key=lambda r: r["order_hash"])
        assert [r["position"] for r in ranked] == positions


def test_global_shuffle_deterministic_under_repartition(spark):
    a = {
        (r["doc_id"], r["shard"], r["position"])
        for r in curation.x04_global_shuffle(spark, SF_DIR).collect()
    }
    b = {
        (r["doc_id"], r["shard"], r["position"])
        for r in curation.x04_global_shuffle(spark, SF_DIR)
        .repartition(7)
        .collect()
    }
    assert a == b


# ------------------------------------------------------------------ CDC apply


def test_cdc_apply_tombstone_drops_entity(spark, tmp_path):
    """An entity whose LAST op is a delete is absent; an earlier delete
    followed by a later upsert resurrects it with the latest value."""
    sf = _write_events(
        spark,
        tmp_path,
        [
            # user 10: upsert then tombstone -> absent
            (1, "2024-03-01 00:00:00", 10, "view", 1.0),
            (2, "2024-03-02 00:00:00", 10, "error", 0.0),
            # user 20: tombstone then re-insert -> present, value 7
            (3, "2024-03-01 00:00:00", 20, "error", 0.0),
            (4, "2024-03-03 00:00:00", 20, "purchase", 7.0),
            # user 30: upserts only -> latest value 5
            (5, "2024-03-01 00:00:00", 30, "click", 3.0),
            (6, "2024-03-02 00:00:00", 30, "click", 5.0),
        ],
    )
    out = {r["user_id"]: r for r in upsert.q19_cdc_apply(spark, sf).collect()}
    assert 10 not in out
    assert out[20]["last_value"] == 7.0 and out[20]["n_ops"] == 2
    assert out[30]["last_value"] == 5.0 and out[30]["last_event_id"] == 6


def test_cdc_apply_ties_break_by_event_id(spark, tmp_path):
    """Same-timestamp ops resolve by highest event_id (arrival seq)."""
    sf = _write_events(
        spark,
        tmp_path,
        [
            (1, "2024-03-01 00:00:00", 10, "view", 1.0),
            (2, "2024-03-01 00:00:00", 10, "view", 2.0),
        ],
    )
    out = upsert.q19_cdc_apply(spark, sf).collect()
    assert len(out) == 1 and out[0]["last_value"] == 2.0


# ---------------------------------------------------------------------- BM25


def test_bm25_scores_only_matching_docs_and_positive(spark):
    rows = text_analysis.x04_bm25_scores(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 1 <= r["n_terms"] <= len(text_analysis._BM25_TERMS)
        assert r["score_e4"] > 0


def test_bm25_matches_docs_containing_terms_exactly(spark):
    """Result doc set == docs containing >= 1 query term."""
    from reddit_data_engineering_project_spark.tables import table

    docs = table(spark, SF_DIR, "documents")
    terms = list(text_analysis._BM25_TERMS)
    expected = {
        r["doc_id"]
        for r in docs.filter(
            F.arrays_overlap(
                F.split(F.col("text"), " "),
                F.array(*[F.lit(t) for t in terms]),
            )
        )
        .select("doc_id")
        .collect()
    }
    got = {
        r["doc_id"]
        for r in text_analysis.x04_bm25_scores(spark, SF_DIR).collect()
    }
    assert got == expected


# ------------------------------------------------------------- market basket


def test_copurchase_pairs_match_self_join_formulation(spark):
    """The basket-comprehension pair generation is exactly the
    self-join's pair set (the oracle pins values; this pins the Spark
    rewrite against the naive formulation ON SPARK, pre-threshold)."""
    from reddit_data_engineering_project_spark.operators import (
        product_analytics as pa,
    )
    from reddit_data_engineering_project_spark.tables import table

    got = {
        (r["part_a"], r["part_b"], r["pair_orders"])
        for r in pa.q21_copurchase_lift(spark, SF_DIR).collect()
    }
    li = (
        table(spark, SF_DIR, "lineitem")
        .select("l_orderkey", "l_partkey")
        .dropDuplicates()
    )
    a = li.alias("a")
    b = li.alias("b")
    expected = {
        (r["part_a"], r["part_b"], r["pair_orders"])
        for r in a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count("*").alias("pair_orders"))
        .filter(F.col("pair_orders") >= pa._BASKET_MIN_PAIR_ORDERS)
        .collect()
    }
    assert got == expected


# ------------------------------------------------------------------ pagerank


def _write_lineitem(spark, tmp_path, order_parts):
    rows = [
        Row(l_orderkey=o, l_partkey=p, l_quantity=1.0)
        for o, parts in order_parts
        for p in parts
    ]
    spark.createDataFrame(rows).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "lineitem.parquet")
    )
    return str(tmp_path)


def test_pagerank_matches_hand_computed_integer_iterations(spark, tmp_path):
    """Path graph A-B-C (each edge in 2 orders): three damped integer
    iterations computed by hand pin the exact e6-scaled ranks."""
    from reddit_data_engineering_project_spark.operators import (
        product_analytics as pa,
    )

    A, B, C = 101, 202, 303
    sf = _write_lineitem(
        spark,
        tmp_path,
        [(1, [A, B]), (2, [A, B]), (3, [B, C]), (4, [B, C])],
    )
    out = {r["part"]: r for r in pa.q21_part_pagerank(spark, sf).collect()}
    assert set(out) == {A, B, C}
    assert out[A]["degree"] == 1 and out[B]["degree"] == 2
    # iter1: A=C=575000, B=1850000
    # iter2: A=C=936250, B=1127500
    # iter3: A=C=629187, B=1741625
    assert out[A]["rank_e6"] == 629187
    assert out[C]["rank_e6"] == 629187
    assert out[B]["rank_e6"] == 1741625


def test_pagerank_deterministic_under_repartition(spark):
    from reddit_data_engineering_project_spark.operators import (
        product_analytics as pa,
    )

    a = {
        (r["part"], r["rank_e6"])
        for r in pa.q21_part_pagerank(spark, SF_DIR).collect()
    }
    b = {
        (r["part"], r["rank_e6"])
        for r in pa.q21_part_pagerank(spark, SF_DIR).repartition(7).collect()
    }
    assert a and a == b


# ------------------------------------------------------------------ bigram LM


def test_lm_quality_score_matches_pure_python_model(spark, tmp_path):
    """Independent reimplementation: add-one bigram LM computed in plain
    Python over crafted docs must reproduce the engine's integer totals."""
    import math
    from collections import Counter

    from reddit_data_engineering_project_spark.operators import (
        text_analysis as ta,
    )

    texts = {
        1: "a b a b c",
        2: "a b",
        3: "c c c a",
    }
    sf = _write_documents(
        spark, tmp_path, [(i, t, "src") for i, t in texts.items()]
    )
    # model
    all_bigrams = Counter()
    vocab = set()
    for t in texts.values():
        toks = t.split()
        vocab.update(toks)
        all_bigrams.update(zip(toks, toks[1:]))
    c1 = Counter()
    for (w1, _), c in all_bigrams.items():
        c1[w1] += c
    V = len(vocab)

    def logp_e6(w1, w2):
        return round(
            math.log((all_bigrams[(w1, w2)] + 1) / (c1[w1] + V)) * 1e6
        )

    expected = {}
    for doc_id, t in texts.items():
        toks = t.split()
        bgs = list(zip(toks, toks[1:]))
        expected[doc_id] = (
            len(bgs),
            sum(logp_e6(w1, w2) for w1, w2 in bgs),
        )
    got = {
        r["doc_id"]: (r["n_bigrams"], r["total_logp_e6"])
        for r in ta.x04_lm_quality_score(spark, sf).collect()
    }
    assert got == expected


def test_lm_quality_score_covers_all_multi_token_docs(spark):
    from reddit_data_engineering_project_spark.operators import (
        text_analysis as ta,
    )
    from reddit_data_engineering_project_spark.tables import table

    docs = table(spark, SF_DIR, "documents")
    n_multi = docs.filter(
        F.size(ta.tokens(F.col("text"))) >= 2
    ).count()
    out = ta.x04_lm_quality_score(spark, SF_DIR)
    assert out.count() == n_multi
    assert all(r["total_logp_e6"] < 0 for r in out.collect())
