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
# ROUND-16 WINDOW (executes the committed round-16 rotation plan
# verbatim — registry history / WINDOWS.md "Round 16 (COMMITTED
# PLAN)"; precondition held: CORRECTNESS_r15 graded the round-15
# window 50/50 green, matching the committed plan name-for-name).
# Pure backfill plus one landing-round registration:
#   (a) the EIGHTEEN r11 rows that rolled from the round-15 (b) tail
#       (q22_seasonal_naive .. x05_corpus_slice — x04_bm25_scores and
#       x04_boilerplate_removal additionally land the round-15
#       pure-extraction refactor, outputs verified byte-identical);
#   (b) the round-15 registration x05_decode_errors (landing-round
#       grade, drained from QUEUED_FOR_NEXT_WINDOW — the
#       corrupt-payload quarantine posture) + the alphabetically-first
#       31 of the 46-member r12 class (q01_csv_scan ..
#       q21_ab_power_analysis); the alphabetically-last FIFTEEN
#       (q21_cohort_ltv, q21_degree_powerlaw, q21_funnel_conversion,
#       q21_next_event_prediction, q21_survival_km,
#       q21_triangle_count, s08_stateful_zscore_replay,
#       x01_dedup_exact_key, x04_global_shuffle, x04_lm_quality_score,
#       x04_quality_percentile_gate, x04_readability, x04_source_caps,
#       x05_byte_histogram, x05_size_binned_shards) roll to round 17
#       per the committed plan below.
# 18 + 1 + 31 = 50.
#
# ROUND-17 ROTATION PLAN (committed now so no entry waits on an
# undocumented promise; precondition: CORRECTNESS_r16 grades the
# window below 50/50 green). Backfill plus the SEVEN round-16
# amendment re-grades (code/oracle changed in round 16 — the three
# unicode-wave fixes, the payload-energy Arrow rework, the two s09
# rows of the ts-edge µs-boundary rework, and pipeline_clean_coerce's
# hostile-props TRY_CAST oracle guard; graded-corpus hashes verified
# unchanged by post-fix sf0.001+sf0.01 runs, but each latest green
# row describes superseded code; same mechanism as rounds 13-16,
# each taking a slot from the (b) tail):
#   (a) the FIFTEEN r12 rows that rolled (q21_cohort_ltv,
#       q21_degree_powerlaw, q21_funnel_conversion,
#       q21_next_event_prediction, q21_survival_km,
#       q21_triangle_count, s08_stateful_zscore_replay,
#       x01_dedup_exact_key, x04_global_shuffle, x04_lm_quality_score,
#       x04_quality_percentile_gate, x04_readability, x04_source_caps,
#       x05_byte_histogram, x05_size_binned_shards —
#       x04_readability's row additionally lands its round-16
#       vowel-class amendment, and s08_stateful_zscore_replay's row
#       lands the round-16 µs-boundary rework) PLUS the six amendment
#       re-grades: x01_dedup_canonicalized (strip-before-lower
#       canon), x05_binary_features (byte-head oracle),
#       pipeline_dedup_report (composes the amended canon oracle),
#       x05_payload_energy (Arrow/mapInPandas rework — the measured
#       4.0 s -> 1.3 s interpreted-HOF finding, SCALE.md round 16),
#       s09_session_gap_replay + s09_session_timeout_replay (the
#       ts-edge wave's pandas-ns-cliff fix: epoch-µs longs across the
#       pandas boundary, timestamps re-cast relationally),
#       pipeline_clean_coerce (TRY_CAST overflow guard — the
#       hostile-props wave's oracle-crash fix; q17_map_funcs' twin
#       fix lands via its (b) row below);
#   (b) the alphabetically-first 28 of the remaining 42-member r13
#       class (pipeline_posts_clean_wire .. q20_udtf_chunks —
#       x05_binary_features and x05_payload_energy left the pool for
#       their (a) amendment slots); the alphabetically-last FOURTEEN
#       (q21_adamic_adar, q21_adamic_adar_capped,
#       q21_event_transitions, q21_kcore_peel, q21_spend_trend_ols,
#       q22_acf_hourly, q22_hampel_mad, q22_seasonal_decompose,
#       s03_session_window, x01_dedup_content_hash, x02_dedup_clusters,
#       x02_minhash_lsh_neardup, x02_neardup_jaccard, x04_doc_stats)
#       roll to round 18.
# 15 + 7 + 28 = 50. Every round-16/17 registration must either take a
# slot from the (b) tail in its own commit or add itself to
# QUEUED_FOR_NEXT_WINDOW — keep velocity <= the handful the window
# can absorb.
GRADING_PRIORITY: tuple[str, ...] = (
    # (a) the eighteen rolled r11 rows
    "q22_seasonal_naive",
    "x02_containment_pairs",
    "x02_dedup_keep_best",
    "x02_fuzzy_levenshtein_neardup",
    "x04_bm25_scores",
    "x04_boilerplate_removal",
    "x04_bpe_merge_apply",
    "x04_bpe_pair_stats",
    "x04_char_entropy",
    "x04_decontamination",
    "x04_feature_hashing",
    "x04_mixing_rebalance",
    "x04_ngram_vocab",
    "x04_pii_scrub",
    "x04_repetition_metrics",
    "x04_sequence_packing",
    "x04_tokenize_to_ids",
    "x05_corpus_slice",
    # (b) x05_decode_errors landing grade + the
    # alphabetically-first 31 r12 backfill rows
    "x05_decode_errors",
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
