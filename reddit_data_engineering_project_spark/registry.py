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
# ``queries()`` (CORRECTNESS_r{N}.json key order == dict order). Round 2
# proved 38 registered queries had never received a driver row because
# import order, not intent, decided the graded window. This list makes
# the window an explicit, reviewed artifact: the first 50 names below are
# what the driver grades this round.
#
# Round-3 composition (per VERDICT.md "Next round" item 1):
#   - the 38 entries never driver-graded (Q13-Q16, Q17 functions, Q19,
#     Q20, S1-S6, 9 X4 entries, all pipeline_*), plus the re-fixed
#     x05_corpus_slice = 39 mandatory slots;
#   - 11 representatives of already-green families (r02 hash evidence)
#     so the window still spans scans, aggregates, joins, set ops,
#     sinks, dedup, similarity, and product analytics.
# Families left outside this round's window (q02-q06, q08) are simple
# relational ops with green r02 rows; tests/test_grading_window.py
# enforces that every family has driver evidence from SOME round.
# Round 4+: rotate representatives so coverage stays fresh.
#
# ROUND-8 ROTATION (executes the round-7 verdict's "Next round"
# items 1+5 — drain the ENTIRE never-driver-graded backlog and
# re-grade the reworked triangle count). CORRECTNESS_r07 graded the
# previous window 50/50 green, the precondition for this rotation.
# The new window below =
#   (a) ALL 23 never-driver-graded entries — the 13 round-7 deferrals
#       (q07 corr/heavy_hitters/mode, q10_local_supplier_volume,
#       q13 range_interval/value_functions, q16_bitwise,
#       q21 ab_power/next_event, x03 recall/kmeans/knn/pq) plus the
#       10 round-7 registrations (q18_schema_evolution_read,
#       x03_ivfpq_topk, x02_semantic_dedup, q21_survival_km,
#       x05_payload_energy, q21_cohort_ltv, q20_grouped_agg_pandas,
#       q11_interval_overlap, q17_variant_shred, q21_degree_powerlaw).
#       After this round NOTHING registered before round 8 lacks a
#       driver row.
#   (b) 25 of the 37 stale re-grades (latest green row r02/r03 = the
#       OLD pre-regeneration corpus): the whole simple-relational
#       tier (q01 csv/json, q02-q06, q07_percentiles, q08 x3),
#       q09_pivot, q10 anti/broadcast/star, q11_range_join_bands,
#       q12_intersect_users, q13_running_frames,
#       q17_adhoc_sql_correlated,
#       q21_funnel_conversion, x01_dedup_exact_key,
#       x02_embedding_neardup, x03_pairwise_label_centroids,
#       x04_doc_stats, x05_binary_features.
#   (c) q21_triangle_count re-grade (degree-ordering rework landed
#       this round) and (d) s08_stateful_zscore_replay, the one
#       round-8 NEW registration, graded in its landing round.
# 23 + 25 + 1 + 1 = 50. TWELVE stale re-grades overflow to round 9
# (the verdict's ten named drops + x05_frame_sample, which cedes its
# slot to the triangle re-grade — x05 keeps binary_features in-window
# plus three fresh r07 rows — + q17_map_funcs, which cedes to the new
# s08 family slot; q17 keeps the adhoc re-grade and variant_shred
# in-window): q10_join_full_outer, q10_join_left_outer,
# q10_join_semi (q10 holds fresh r07 null_safe evidence and three
# battery re-grades stay in), q21_event_transitions (q21 got eleven
# r07 rows; funnel_conversion is the events-family re-grade),
# x02_dedup_clusters, x02_neardup_jaccard (x02 got five r07 rows and
# keeps the embedding re-grade in), q09_cube, q09_rollup (ONLY the
# pivot re-grade stays in-window; q09 holds green r05/r06 evidence
# via rollup/unpivot), q12_union_daily_slices, q12_union_by_name
# (q12 holds fresh r07 table_diff evidence and the intersect re-grade
# stays in), x05_frame_sample, q17_map_funcs.
#
# ROUND-9 ROTATION PLAN (committed now so no entry waits on an
# undocumented promise): mandatory slots = the 12 stale overflows
# above + the THIRTEEN round-8 post-rotation registrations
# (q07_cms_heavy_hitters, q07_histogram_quantiles, q21_kcore_peel,
# q22_hampel_mad, x03_hamming_topk, x03_hamming_rerank,
# x04_weighted_sample, q10_bloom_prune, q18_partitioned_prune,
# x03_range_search, q21_adamic_adar, q22_acf_hourly,
# q22_seasonal_decompose — mirrored in
# tests/test_grading_window.py's QUEUED_FOR_NEXT_WINDOW; any further
# registration adds itself to both lists in its own commit).
# 12 + 13 = 25 mandatory; the remaining 25 slots backfill
# current-corpus re-grades of the OLDEST rows. Concretely (computed
# from the committed CORRECTNESS files at end of round 8): no entry's
# latest green is r04; exactly 28 entries sit at r05 —
# pipeline_posts_clean_wire, q01_scan_explicit_schema,
# q07_hash_aggregate, q09_grouping_sets, q10_star_report,
# q13_rank_dense_rank, q13_topn_per_group, q13_window_share,
# q14_string_funcs, q14_string_funcs2, q15_datetime_funcs,
# q17_array_funcs, q17_explode_tokens, q17_json_corrupt_records,
# q20_arrow_udf_ttr, q20_udtf_chunks, x01_dedup_content_hash,
# x02_minhash_lsh_neardup, x03_cosine_topk_bruteforce,
# x04_fingerprint, x04_hash_sample, x04_language_id,
# x04_length_histogram, x04_quality_filter, x04_stratified_sample,
# x04_term_frequency, x04_tfidf, x04_token_count —
# 25 of the 28 fit (25 + 25 = 50); the three alphabetically-last r05
# rows (x04_term_frequency, x04_tfidf, x04_token_count) plus the
# oldest r06 rows (flagship entry() twin first) roll to round 10's
# backfill instead. After round 9 the stale r02/r03 queue is EMPTY
# and nothing older than r05 remains — with exactly THREE r05 rows
# left.
#
# ROUND-9 WINDOW (executes the plan above verbatim; CORRECTNESS_r08
# graded the round-8 window 50/50 green, the precondition):
#   (a) the 13 round-8 post-rotation registrations — after this round
#       NOTHING registered before round 9 lacks a driver row;
#   (b) the 12 round-8 stale overflows — the last entries whose latest
#       green row is the OLD r02/r03 corpus, plus q17_map_funcs, whose
#       only driver row is an r05 ERROR (a since-fixed tables.py
#       ts-dtype bug; the single latest-grade red in history);
#   (c) the THREE round-9 registrations, graded in their landing round
#       (s08 precedent, and the only way the proof-lag queue stays at
#       zero): s09_session_gap_replay (the timeout sessionizer's
#       gap-closed batch twin — verdict item 6; s09 is a NEW family so
#       it must take a slot), x00_adversarial_audit (the planted
#       hostile-slice sentinel — verdict item 3; new family, must take
#       a slot), q21_adamic_adar_capped (the physical hub cap —
#       verdict item 4);
#   (d) 22 backfill re-grades of the oldest current rows: the
#       alphabetically-first 22 of the 28 entries whose latest green
#       is r05; the six alphabetically-last (x04_length_histogram,
#       x04_quality_filter, x04_stratified_sample, x04_term_frequency,
#       x04_tfidf, x04_token_count — the last three per the original
#       plan, the first three ceding their slots to the (c)
#       registrations) roll to round 10's backfill.
# 13 + 12 + 3 + 22 = 50. After this round the r02/r03 class is EMPTY,
# no registration lacks a driver row, and exactly six r05 rows remain.
#
# ROUND-10 WINDOW (executes the committed round-10 plan, amended per
# its own velocity rule; precondition held: CORRECTNESS_r09 graded the
# round-9 window 50/50 green). The committed plan was pure backfill —
# the six r05 rows + the alphabetically-first 44 r06 rows. Round 10
# then (i) registered two entries off the r09 verdict
# (s09_session_timeout_replay — the watermark-advance timeout-closure
# twin, verdict item 3; x02_simhash16_neardup — the 16-bit-band
# large-corpus SimHash, verdict item 4) and (ii) bounded
# s09_session_gap_replay to a deterministic md5 1-in-8 user sample
# (verdict item 2), which CHANGES its output — a changed-output entry
# must re-grade in its landing round or its past green row describes
# code that no longer exists. Per the committed rule ("every round-10
# registration must either take a slot from the (b) tail in its own
# commit or add itself to QUEUED_FOR_NEXT_WINDOW"), those three take
# the three alphabetically-last slots of the 44: x04_decontamination,
# x04_mixing_rebalance, x04_ngram_vocab roll to round 11.
#   (a) the six remaining r05 rows;
#   (b) the three landing-round grades: s09_session_gap_replay
#       (sampled re-grade), s09_session_timeout_replay (new),
#       x02_simhash16_neardup (new);
#   (c) the alphabetically-first 41 r06 rows (pipeline_* leads, so the
#       flagship entry() twin pipeline_topk_window re-grades here;
#       x02_simhash_neardup's helper refactor re-grades in its
#       natural slot).
# 6 + 3 + 41 = 50. After round 10 nothing older than r06 remains
# (nine r06 rows).
#
# ROUND-11 ROTATION PLAN (committed now so no entry waits on an
# undocumented promise; precondition: CORRECTNESS_r10 grades the
# window above 50/50 green). Round 10 graded its registrations in
# their landing window, so round 11 has ZERO mandatory never-graded
# slots — pure backfill again:
#   (a) the nine remaining r06 rows (x04_decontamination,
#       x04_mixing_rebalance, x04_ngram_vocab, x04_pii_scrub,
#       x04_repetition_metrics, x04_sequence_packing,
#       x04_tokenize_to_ids, x05_corpus_slice, x05_payload_resize);
#   (b) 41 of the 49 entries whose latest green will then be r07,
#       alphabetical (computed from the committed CORRECTNESS files at
#       end of round 10): pipeline_dedup_report,
#       pipeline_events_monitor, pipeline_feature_store,
#       pipeline_split_leakage_audit, q07_winsorized_stats,
#       q10_join_null_safe, q11_asof_tolerance, q12_table_diff,
#       q13_percent_rank_cume, q16_null_semantics,
#       q17_higher_order_funcs, q18_snapshot_publish_read,
#       q19_cdc_apply, q19_incremental_agg_maintain, q20_map_in_arrow,
#       q21_ab_lift_ztest, q21_activity_streaks,
#       q21_attribution_last_touch, q21_copurchase_lift,
#       q21_copurchase_reach2, q21_dau_wau_stickiness,
#       q21_part_pagerank, q21_rfm_segments, q21_sessionize_gap,
#       q21_spend_trend_ols, q22_cusum_drift, q22_ewma_window,
#       q22_locf_fill, q22_seasonal_naive, x02_containment_pairs,
#       x02_dedup_keep_best, x02_fuzzy_levenshtein_neardup,
#       x03_ann_lsh_bucketed, x03_ivf_topk, x04_bm25_scores,
#       x04_boilerplate_removal, x04_bpe_merge_apply,
#       x04_bpe_pair_stats, x04_char_entropy, x04_data_quality_report,
#       x04_feature_hashing; the alphabetically-last eight
#       (x04_global_shuffle, x04_lm_quality_score,
#       x04_quality_percentile_gate, x04_readability, x04_source_caps,
#       x05_byte_histogram, x05_frame_dedup, x05_size_binned_shards)
#       roll to round 12.
# 9 + 41 = 50. Every round-11 registration must either take a slot
# from the (b) tail in its own commit or add itself to
# QUEUED_FOR_NEXT_WINDOW — keep velocity ≤ the handful the window can
# absorb.
GRADING_PRIORITY: tuple[str, ...] = (
    # (a) the six r05 rows — the last entries older than r06
    "x04_length_histogram",
    "x04_quality_filter",
    "x04_stratified_sample",
    "x04_term_frequency",
    "x04_tfidf",
    "x04_token_count",
    # (b) landing-round grades: the sampled s09 re-grade + the two
    # round-10 registrations
    "s09_session_gap_replay",
    "s09_session_timeout_replay",
    "x02_simhash16_neardup",
    # (c) backfill: the alphabetically-first 41 r06 rows
    "pipeline_clean_coerce",
    "pipeline_curation_full",
    "pipeline_daily_ingest",
    "pipeline_topk_window",
    "pipeline_training_prep",
    "q01_orc_scan",
    "q01_xml_scan",
    "q07_weighted_median",
    "q09_unpivot",
    "q10_join_salted_skew",
    "q11_asof_join",
    "q12_except_all",
    "q13_lag_lead",
    "q14_string_funcs3",
    "q15_datetime_funcs2",
    "q16_math_conditional",
    "q17_json_funcs",
    "q18_export_training_shards",
    "q18_sink_roundtrip",
    "q18_zorder_key",
    "q19_scd2_history",
    "q19_upsert_keep_latest",
    "q20_apply_in_pandas_zscore",
    "q20_pandas_scalar_udf",
    "q21_cohort_retention",
    "q22_rolling_zscore",
    "q22_timeseries_gapfill",
    "s01_tumbling_window",
    "s02_sliding_window",
    "s03_session_window",
    "s04_watermark_late_drop",
    "s05_stateful_dedup",
    "s06_interval_join",
    "s07_windowed_topk",
    "x01_dedup_canonicalized",
    "x02_incremental_neardup",
    "x02_simhash_neardup",
    "x03_sq8_topk",
    "x04_chunking",
    "x04_corpus_profile",
    "x04_dataset_split",
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
