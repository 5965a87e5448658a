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
# ROUND-7 ROTATION (executes the round-6 verdict's "Next round" items
# 1+2 — the never-graded backlog sweep). CORRECTNESS_r06 graded the
# previous 50-slot window fully green (50/50 hash), which was the
# precondition the round-6 status note set for this rotation. The new
# window below holds ONLY entries with no driver hash row:
#   (a) 49 of the 62 never-driver-graded entries: all 12 ungraded x04,
#       11 of 13 ungraded q21, the two rows-only-to-full-oracle
#       upgrades (x03_ann_lsh_bucketed, x03_ivf_topk) whose only
#       driver row is a round-2 ``no_oracle``, all 4 ungraded q22,
#       x02 containment/keep_best/fuzzy, all 3 ungraded x05,
#       q19 cdc/incremental, q20_map_in_arrow, all 4 ungraded
#       pipelines, and one family-evidence representative for each
#       family whose never-graded members would otherwise all sit
#       outside the window (q07_winsorized_stats, q10_join_null_safe,
#       q11_asof_tolerance, q12_table_diff, q13_percent_rank_cume,
#       q16_null_semantics, q17_higher_order_funcs);
#   (b) q18_snapshot_publish_read — NEW this round (snapshot-protocol
#       read-back audit, verdict item 5); it takes the q18 family
#       slot now that q18 has never-graded members again.
# Rotated out: the entire round-6 window (50/50 green r06 rows — every
# family keeps that as its continuity evidence).
#
# ROUND-8 ROTATION PLAN (committed now per verdict item 2 so no entry
# waits on an undocumented promise; 51 candidates for 50 slots):
#   (a) the 13 never-graded entries deferred this round (they are
#       tests/test_grading_window.py::QUEUED_FOR_NEXT_WINDOW minus the
#       new q18_schema_evolution_read, which also joins this list):
#       q07_corr_exact_moments, q07_heavy_hitters, q07_mode_exact,
#       q10_local_supplier_volume, q13_range_interval_frames,
#       q13_value_functions, q16_bitwise_funcs, q21_ab_power_analysis,
#       q21_next_event_prediction, x03_ann_recall_report,
#       x03_kmeans_step, x03_knn_classify, x03_pq_topk,
#       + the post-rotation round-7 registrations
#       (q18_schema_evolution_read, x03_ivfpq_topk,
#       x02_semantic_dedup, q21_survival_km, x05_payload_energy,
#       q21_cohort_ltv, q20_grouped_agg_pandas, q11_interval_overlap,
#       q17_variant_shred, q21_degree_powerlaw) = 23 mandatory slots;
#   (b) the 37 entries whose latest green evidence is r02/r03 (the
#       OLD, pre-regeneration corpus), enumerated from the committed
#       CORRECTNESS files: q01_csv_scan, q01_json_scan,
#       q02_projection_pruning, q03_filter_predicates, q04_topk,
#       q05_multikey_sort, q06_limit_offset, q07_percentiles,
#       q08_approx_distinct, q08_count_distinct, q08_distinct_pairs,
#       q09_cube, q09_pivot, q09_rollup, q10_join_anti,
#       q10_join_broadcast_dims, q10_join_full_outer,
#       q10_join_inner_star, q10_join_left_outer, q10_join_semi,
#       q11_range_join_bands, q12_intersect_users, q12_union_by_name,
#       q12_union_daily_slices, q13_running_frames,
#       q17_adhoc_sql_correlated, q17_map_funcs,
#       q21_event_transitions, q21_funnel_conversion,
#       x01_dedup_exact_key, x02_dedup_clusters, x02_embedding_neardup,
#       x02_neardup_jaccard, x03_pairwise_label_centroids,
#       x04_doc_stats, x05_binary_features, x05_frame_sample;
#   (c) 23 + 37 = 60 — TEN overflow to round 9: drop
#       q10_join_full_outer (q10 gets fresh r07 evidence via
#       join_null_safe; anti/broadcast/star re-grades stay in),
#       q21_event_transitions (q21 gets eleven fresh r07 rows;
#       funnel_conversion stays in as the events-family re-grade),
#       x02_dedup_clusters (x02 gets five fresh r07 rows; its
#       recursive-CTE-oracled twin keep_best carries the iterative
#       evidence),
#       x02_neardup_jaccard (x02 gets five fresh r07 rows and keeps
#       the clusters/embedding re-grades in),
#       q09_cube (q09 keeps the pivot re-grade in and holds green
#       r05/r06 evidence via rollup/unpivot),
#       q09_rollup (q09 keeps cube + pivot re-grades in and holds
#       green r05/r06 evidence via rollup/unpivot),
#       q12_union_daily_slices, q12_union_by_name (q12 holds fresh r07
#       evidence via table_diff and one union re-grade stays in),
#       q10_join_left_outer and q10_join_semi (q10 gets fresh r07
#       evidence via join_null_safe and three other battery re-grades
#       stay in), unless a red r07 row creates a more urgent re-grade.
GRADING_PRIORITY: tuple[str, ...] = (
    # (a) q21 product/graph analytics — 11 of 13 never-graded members
    "q21_ab_lift_ztest",
    "q21_activity_streaks",
    "q21_attribution_last_touch",
    "q21_copurchase_lift",
    "q21_copurchase_reach2",
    "q21_dau_wau_stickiness",
    "q21_part_pagerank",
    "q21_rfm_segments",
    "q21_sessionize_gap",
    "q21_spend_trend_ols",
    "q21_triangle_count",
    # (a) x04 text-analysis / curation — all 12 never-graded members
    "x04_bm25_scores",
    "x04_boilerplate_removal",
    "x04_bpe_merge_apply",
    "x04_bpe_pair_stats",
    "x04_char_entropy",
    "x04_data_quality_report",
    "x04_feature_hashing",
    "x04_global_shuffle",
    "x04_lm_quality_score",
    "x04_quality_percentile_gate",
    "x04_readability",
    "x04_source_caps",
    # (a) x03 rows-only -> full-oracle upgrades (first hash grading)
    "x03_ann_lsh_bucketed",
    "x03_ivf_topk",
    # (a) q22 time series — all 4 never-graded members
    "q22_cusum_drift",
    "q22_ewma_window",
    "q22_locf_fill",
    "q22_seasonal_naive",
    # (a) x02 near-dup ladder rungs
    "x02_containment_pairs",
    "x02_dedup_keep_best",
    "x02_fuzzy_levenshtein_neardup",
    # (a) x05 multimodal
    "x05_byte_histogram",
    "x05_frame_dedup",
    "x05_size_binned_shards",
    # (a) q19 changelog / materialized-view maintenance
    "q19_cdc_apply",
    "q19_incremental_agg_maintain",
    # (a) q20 Arrow seam
    "q20_map_in_arrow",
    # (a) composed pipelines
    "pipeline_dedup_report",
    "pipeline_events_monitor",
    "pipeline_feature_store",
    "pipeline_split_leakage_audit",
    # (a) family-evidence representatives (their families' other
    # never-graded members defer to round 8)
    "q07_winsorized_stats",
    "q10_join_null_safe",
    "q11_asof_tolerance",
    "q12_table_diff",
    "q13_percent_rank_cume",
    "q16_null_semantics",
    "q17_higher_order_funcs",
    # (b) new this round: snapshot-protocol audit (q18 family slot)
    "q18_snapshot_publish_read",
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
