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
# ROUND-12 WINDOW (executes the committed round-12 plan verbatim;
# precondition held: CORRECTNESS_r11 graded the round-11 window 50/50
# green). Zero mandatory never-graded slots — pure backfill:
#   (a) the eight remaining r07 rows;
#   (b) the alphabetically-first 42 of the 50 entries whose latest
#       green is r08. The alphabetically-last eight r08 rows
#       (x03_ivfpq_topk, x03_kmeans_step, x03_knn_classify,
#       x03_pairwise_label_centroids, x03_pq_topk, x04_doc_stats,
#       x05_binary_features, x05_payload_energy) roll to round 13.
# 8 + 42 = 50. This window also delivers the landing-round re-grade of
# q13_running_frames (output discipline changed to e4-BIGINT folds in
# round 11; WINDOWS.md round-12 note).
#
# ROUND-13 ROTATION PLAN (committed now so no entry waits on an
# undocumented promise; precondition: CORRECTNESS_r12 grades the
# window below 50/50 green). Pure backfill again:
#   (a) the eight remaining r08 rows above;
#   (b) the alphabetically-first 42 of the 49 entries whose latest
#       green will then be r09 (pipeline_posts_clean_wire ..
#       x03_hamming_rerank — the verbatim list is in WINDOWS.md); the
#       alphabetically-last seven (x03_hamming_topk, x03_range_search,
#       x04_fingerprint, x04_hash_sample, x04_language_id,
#       x04_weighted_sample, x05_frame_sample) roll to round 14.
# 8 + 42 = 50. Every round-12/13 registration must either take a slot
# from the (b) tail in its own commit or add itself to
# QUEUED_FOR_NEXT_WINDOW — keep velocity <= the handful the window can
# absorb.
GRADING_PRIORITY: tuple[str, ...] = (
    # (a) the eight remaining r07 rows
    "x04_global_shuffle",
    "x04_lm_quality_score",
    "x04_quality_percentile_gate",
    "x04_readability",
    "x04_source_caps",
    "x05_byte_histogram",
    "x05_frame_dedup",
    "x05_size_binned_shards",
    # (b) backfill: the alphabetically-first 42 r08 rows
    "q01_csv_scan",
    "q01_json_scan",
    "q02_projection_pruning",
    "q03_filter_predicates",
    "q04_topk",
    "q05_multikey_sort",
    "q06_limit_offset",
    "q07_corr_exact_moments",
    "q07_heavy_hitters",
    "q07_mode_exact",
    "q07_percentiles",
    "q08_approx_distinct",
    "q08_count_distinct",
    "q08_distinct_pairs",
    "q09_pivot",
    "q10_join_anti",
    "q10_join_broadcast_dims",
    "q10_join_inner_star",
    "q10_local_supplier_volume",
    "q11_interval_overlap",
    "q11_range_join_bands",
    "q12_intersect_users",
    "q13_range_interval_frames",
    "q13_running_frames",
    "q13_value_functions",
    "q16_bitwise_funcs",
    "q17_adhoc_sql_correlated",
    "q17_variant_shred",
    "q18_schema_evolution_read",
    "q20_grouped_agg_pandas",
    "q21_ab_power_analysis",
    "q21_cohort_ltv",
    "q21_degree_powerlaw",
    "q21_funnel_conversion",
    "q21_next_event_prediction",
    "q21_survival_km",
    "q21_triangle_count",
    "s08_stateful_zscore_replay",
    "x01_dedup_exact_key",
    "x02_embedding_neardup",
    "x02_semantic_dedup",
    "x03_ann_recall_report",
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
