"""Adversarial-corpus regression net.

The round-8 adversarial sweep (``tools/adversarial_corpus.py`` +
``tools/check_oracle.py``) found THIRTEEN latent divergences that the
committed fixtures cannot exhibit — oracle crashes on malformed JSON,
a ``parse_json`` FAILFAST job-killer, float-sum ulp flips under key
skew, a never-matching RE2 ``\\u`` escape, dropped zero-token docs, a
descending-``sequence`` byte fabricator, and char-vs-byte stride drift.
All are fixed; this test regenerates the hostile corpus in tmp_path
and re-runs exactly those entries through the same compare the driver
uses, so none of the thirteen can silently regress. The full 202-entry
sweep stays a tool invocation (too slow for the suite):

    python tools/adversarial_corpus.py --out /tmp/advcorpus
    python tools/check_oracle.py --sf /tmp/advcorpus
"""

from __future__ import annotations

import importlib
import os
import sys

import duckdb
import pytest

from reddit_data_engineering_project_spark import registry

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools")
)

registry.load_all_operators()

#: The thirteen entries the round-8 adversarial sweep caught, plus the
#: five the round-10 NULL-user class caught (anonymous events form ONE
#: grouping key on both engines; equi-joins never match them; NULLS
#: FIRST/LAST tiebreak defaults differ; non-nullable applyInPandas
#: output schemas crash on the group's Arrow nulls; int(NaN) raises in
#: replay key extraction).
SWEEP_FINDINGS = [
    "pipeline_clean_coerce",
    "q10_join_left_outer",
    "q17_json_funcs",
    "q17_map_funcs",
    "q17_variant_shred",
    "q22_ewma_window",
    "x02_embedding_neardup",
    "x03_pairwise_label_centroids",
    "x04_language_id",
    "x04_repetition_metrics",
    "x04_tokenize_to_ids",
    "x05_byte_histogram",
    "x05_payload_resize",
    # round-10 NULL-user class
    "q08_approx_distinct",
    "q11_asof_join",
    "q11_asof_tolerance",
    "q20_apply_in_pandas_zscore",
    "s07_windowed_topk",
    "s08_stateful_zscore_replay",
    # round-11 extreme-value class (-0.0 / denormal / domain-edge
    # magnitude): Spark's BigDecimal round can never emit -0.0 while
    # DuckDB's double round preserves the sign bit — five oracles that
    # inlined the round spelling without dround_sql's "+ 0.0"
    # canonicalizer diverged (q11/s06/q19/q20/pipeline_clean_coerce);
    # q13_running_frames' windowed double sums flipped a rounded cent
    # under magnitude dominance (DuckDB segment-tree vs Spark
    # sequential association) and now folds e4-quantized BIGINTs. The
    # 1e9 probe additionally proved out-of-domain values overflow the
    # quantized-compare casts — now an ingest contract
    # (tables.VALUE_DOMAINS), so the corpus stresses the ±1e3 edge.
    "q13_running_frames",
    "q19_upsert_keep_latest",
    "q20_pandas_scalar_udf",
    "s06_interval_join",
    # round-11 unicode-edge class (astral-plane surrogate pairs,
    # combining marks, RTL runs in documents.text): the frame
    # sampler's oracle sliced the TEXT (code points) where the Spark
    # operator slices the encoded PAYLOAD (bytes) — invisible while
    # the lang='en' slice stayed ASCII; the oracle now slices byte-true
    # in the hex domain (2 hex chars per byte), and the composed frame
    # dedup heals with it.
    "x05_frame_sample",
    "x05_frame_dedup",
]

TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


@pytest.fixture(scope="module")
def adv_sf(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("advcorpus"))
    adv = importlib.import_module("adversarial_corpus")
    argv = sys.argv
    sys.argv = ["adversarial_corpus.py", "--out", out]
    try:
        adv.main()
    finally:
        sys.argv = argv
    return out


@pytest.fixture(scope="module")
def adv_duck(adv_sf):
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(adv_sf, f"{t}.parquet").replace("'", "''")
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", SWEEP_FINDINGS)
def test_sweep_finding_stays_green(spark, adv_sf, adv_duck, name):
    from check_oracle import table_hash

    sdf = registry.QUERIES[name](spark, adv_sf)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns
    res = adv_duck.execute(registry.ORACLES[name])
    drows = res.fetchall()
    dcols = [d[0] for d in res.description]
    assert sorted(scols) == sorted(dcols), (scols, dcols)
    assert len(srows) == len(drows), (len(srows), len(drows))
    assert table_hash(srows, scols) == table_hash(drows, dcols)
