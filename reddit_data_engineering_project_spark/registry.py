"""Query registry: the engine's declared operator surface.

Every implemented operator registers a ``(spark, sf_dir) -> DataFrame``
callable plus (when SQL-expressible) the equivalent ANSI SQL for the
DuckDB oracle. ``__spark_entry__.py`` exposes these to the driver, which
compares row-count + schema + order-insensitive value hash at sf=0.01.

Conventions (oracle-parity rules, SURVEY §7 "hard parts"):
- Alias EVERY computed/aggregate column identically on both sides.
- ``events.ts`` loads through ``tables.table()``, which normalizes both
  corpus generations (legacy ns-precision, current ``timestamp[us]``) to
  a session-TZ (UTC) TimestampType; oracle SQL keeps
  ``CAST(ts AS TIMESTAMP)`` wherever it is output or compared.
- Money sums: round the FINAL aggregate (``round(sum(x), 2)``) — both
  engines then snap to the same double.
- Averages/ratios: round to 4-6 decimals — and when the two engines
  compute a metric through DIFFERENT numeric paths, emit a scaled
  BIGINT (multiply-then-round) instead of a double.
- Integer outputs must be integer-typed on BOTH engines: DuckDB's
  ceil/floor return DOUBLE, sign() returns an integer, and sum(BIGINT)
  returns HUGEINT — cast each to BIGINT in the oracle (and mirror the
  cast in Spark when its type differs). Value hashes distinguish
  ``23`` from ``23.0``.
- Rounded DOUBLE outputs must canonicalize IEEE negative zero: Spark's
  BigDecimal ``round()`` can never emit ``-0.0``, DuckDB's double
  ``round()`` preserves the sign bit, and the value hash distinguishes
  them. Use ``functions.numeric.dround``/``dround_sql`` (their
  trailing ``+ 0.0`` is the canonicalizer) — never an inlined
  ``round(x*100)/100`` without it (the r11 extreme-value sweep caught
  five such oracles).
- Windowed/running SUMs of doubles are association-order-dependent
  (DuckDB aggregates frames via a segment tree, Spark sequentially):
  fold e4/e6-quantized BIGINTs instead, inside the declared
  ``tables.VALUE_DOMAINS`` headroom.
"""

from __future__ import annotations

import functools
import textwrap
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .session import ensure_session_confs

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}
TAGS: dict[str, tuple[str, ...]] = {}


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    """Register a query under ``name`` with an optional DuckDB oracle SQL.

    Queries without an oracle get the driver's weaker rows-only check
    (reserved for genuinely non-SQL-expressible ops: seeded LSH, streaming
    state machines).
    """

    def deco(fn: QueryFn) -> QueryFn:
        @functools.wraps(fn)
        def wrapper(spark: SparkSession, sf_dir: str) -> DataFrame:
            ensure_session_confs(spark)
            return fn(spark, sf_dir)

        if name in QUERIES:
            raise ValueError(f"duplicate query registration: {name}")
        QUERIES[name] = wrapper
        if oracle is not None:
            ORACLES[name] = textwrap.dedent(oracle).strip()
        if tags:
            TAGS[name] = tuple(tags)
        return wrapper

    return deco


# The driver's correctness gate grades AT MOST the first 50 entries of
# ``queries()`` (CORRECTNESS_r{N}.json key order == dict order). This
# list makes the window an explicit, reviewed artifact: the first 50
# names below are what the driver grades this round. Executed-round
# history lives in WINDOWS.md; tests/test_grading_window.py enforces
# window == priority and per-family evidence.
#
# ROUND-15 WINDOW (executes the committed round-15 rotation plan
# verbatim — r14 verdict "Next round" item 1; precondition held:
# CORRECTNESS_r14 graded the round-14 window 50/50 green, matching
# the committed plan name-for-name). Backfill plus the ELEVEN
# round-14 amendment re-grades:
#   (a) the twelve r10 rows that rolled from the round-14 (b) tail
#       (x02_simhash16_neardup .. x04_token_count — x03_sq8_topk's
#       row additionally lands the round-14 NULL-embedding exclusion,
#       whose code it shares, and x04_corpus_profile's row lands the
#       round-14 n_too_short when/otherwise(0) fix);
#   (b) the ELEVEN round-14 amendment re-grades (code changed in
#       round 14, graded-corpus hashes verified unchanged by full
#       post-fix sf0.01 sweeps, but each latest green row described
#       superseded code): x00_adversarial_audit (null_concat probe;
#       round 15 further extends the sentinel with the empty-slice
#       ROLLUP probe pinning Spark's zero-rows-on-empty semantics —
#       r14 verdict item 6 — so this landing grade covers both) and
#       the TEN vector entries of the NULL-embedding exclusion rework
#       (x02_embedding_neardup, x02_semantic_dedup,
#       x03_ann_lsh_bucketed, x03_ann_recall_report, x03_ivf_topk,
#       x03_ivfpq_topk, x03_kmeans_step, x03_knn_classify,
#       x03_pairwise_label_centroids, x03_pq_topk) — PLUS the
#       alphabetically-first 27 of the 45 remaining r11 rows
#       (pipeline_dedup_report .. q22_locf_fill); the remaining
#       EIGHTEEN r11 rows (q22_seasonal_naive .. x05_corpus_slice)
#       roll to round 16 per the committed plan below.
# 12 + 11 + 27 = 50.
#
# ROUND-16 ROTATION PLAN (committed now so no entry waits on an
# undocumented promise; precondition: CORRECTNESS_r15 grades the
# window below 50/50 green). Pure backfill unless round-15 work
# produces amendments (any such re-grade takes a slot from the (b)
# tail in its own commit, same mechanism as rounds 13-15):
#   (a) the EIGHTEEN r11 rows that rolled (q22_seasonal_naive,
#       x02_containment_pairs, x02_dedup_keep_best,
#       x02_fuzzy_levenshtein_neardup, x04_bm25_scores,
#       x04_boilerplate_removal, x04_bpe_merge_apply,
#       x04_bpe_pair_stats, x04_char_entropy, x04_decontamination,
#       x04_feature_hashing, x04_mixing_rebalance, x04_ngram_vocab,
#       x04_pii_scrub, x04_repetition_metrics, x04_sequence_packing,
#       x04_tokenize_to_ids, x05_corpus_slice);
#   (b) the round-15 registration x05_decode_errors (landing-round
#       grade, drained from QUEUED_FOR_NEXT_WINDOW — the
#       corrupt-payload quarantine posture) + the alphabetically-first
#       31 of the 46 entries whose latest green will then be r12
#       (q01_csv_scan .. q21_ab_power_analysis — the 49-member r12
#       class minus x02_embedding_neardup, x02_semantic_dedup,
#       x03_ann_recall_report, which re-grade in round 15 above); the
#       alphabetically-last FIFTEEN (q21_cohort_ltv,
#       q21_degree_powerlaw, q21_funnel_conversion,
#       q21_next_event_prediction, q21_survival_km,
#       q21_triangle_count, s08_stateful_zscore_replay,
#       x01_dedup_exact_key, x04_global_shuffle, x04_lm_quality_score,
#       x04_quality_percentile_gate, x04_readability, x04_source_caps,
#       x05_byte_histogram, x05_size_binned_shards) roll to round 17
#       (the q21/s08/x01/x04/x05 families keep round-14/15 evidence
#       via this and the prior window).
# 18 + 1 + 31 = 50. Every round-15/16 registration must either take a
# slot from the (b) tail in its own commit or add itself to
# QUEUED_FOR_NEXT_WINDOW — keep velocity <= the handful the window
# can absorb.
GRADING_PRIORITY: tuple[str, ...] = (
    # (a) the twelve rolled r10 rows
    "x02_simhash16_neardup",
    "x02_simhash_neardup",
    "x03_sq8_topk",
    "x04_chunking",
    "x04_corpus_profile",
    "x04_dataset_split",
    "x04_length_histogram",
    "x04_quality_filter",
    "x04_stratified_sample",
    "x04_term_frequency",
    "x04_tfidf",
    "x04_token_count",
    # (b) the eleven round-14 amendment re-grades
    "x00_adversarial_audit",
    "x02_embedding_neardup",
    "x02_semantic_dedup",
    "x03_ann_lsh_bucketed",
    "x03_ann_recall_report",
    "x03_ivf_topk",
    "x03_ivfpq_topk",
    "x03_kmeans_step",
    "x03_knn_classify",
    "x03_pairwise_label_centroids",
    "x03_pq_topk",
    # plus the alphabetically-first 27 r11 backfill rows
    "pipeline_dedup_report",
    "pipeline_events_monitor",
    "pipeline_feature_store",
    "pipeline_split_leakage_audit",
    "q07_winsorized_stats",
    "q10_join_null_safe",
    "q11_asof_tolerance",
    "q12_table_diff",
    "q13_percent_rank_cume",
    "q16_null_semantics",
    "q17_higher_order_funcs",
    "q18_snapshot_publish_read",
    "q19_cdc_apply",
    "q19_incremental_agg_maintain",
    "q20_map_in_arrow",
    "q21_ab_lift_ztest",
    "q21_activity_streaks",
    "q21_attribution_last_touch",
    "q21_copurchase_lift",
    "q21_copurchase_reach2",
    "q21_dau_wau_stickiness",
    "q21_part_pagerank",
    "q21_rfm_segments",
    "q21_sessionize_gap",
    "q22_cusum_drift",
    "q22_ewma_window",
    "q22_locf_fill",
)

GRADED_WINDOW = 50


def ordered_queries() -> dict[str, QueryFn]:
    """Registered queries with :data:`GRADING_PRIORITY` names first.

    The driver grades the first :data:`GRADED_WINDOW` entries of this
    dict; everything else follows in registration order and keeps its
    pytest / ``tools/check_oracle.py`` coverage.
    """
    out: dict[str, QueryFn] = {}
    for name in GRADING_PRIORITY:
        out[name] = QUERIES[name]
    for name, fn in QUERIES.items():
        if name not in out:
            out[name] = fn
    return out


def ordered_oracles() -> dict[str, str]:
    """Oracle SQL in the same order as :func:`ordered_queries`."""
    q = ordered_queries()
    return {name: ORACLES[name] for name in q if name in ORACLES}


def load_all_operators() -> None:
    """Import every operator module so registrations run."""
    from .operators import (  # noqa: F401
        adversarial,
        aggregates,
        bucketing,
        curation,
        dedup,
        joins,
        layout,
        multimodal,
        product_analytics,
        relational,
        setops,
        similarity,
        sinks,
        text_analysis,
        timeseries,
        upsert,
        windows,
    )
    from .functions import scalar, text, udfs  # noqa: F401
    from .streaming import stream_queries  # noqa: F401
    from .transforms import posts  # noqa: F401
