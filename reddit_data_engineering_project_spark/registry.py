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
# ROUND-17 WINDOW (executes the committed round-17 rotation plan
# verbatim — WINDOWS.md "Round 17 (COMMITTED PLAN)"; precondition
# held: CORRECTNESS_r16 graded the round-16 window 50/50 green,
# matching the committed plan name-for-name in order). Backfill plus
# the SEVEN round-16 amendment re-grades (code/oracle changed in
# round 16 — the three unicode-wave fixes, the payload-energy Arrow
# rework, the two s09 rows of the ts-edge µs-boundary rework, and
# pipeline_clean_coerce's hostile-props TRY_CAST oracle guard;
# graded-corpus hashes verified unchanged by post-fix sf0.001+sf0.01
# runs, but each latest green row describes superseded code; same
# mechanism as rounds 13-16, each taking a slot from the (b) tail):
#   (a) the FIFTEEN r12 rows that rolled (q21_cohort_ltv ..
#       x05_size_binned_shards — x04_readability's row additionally
#       lands its round-16 vowel-class amendment, and
#       s08_stateful_zscore_replay's row lands the round-16
#       µs-boundary rework) PLUS the SEVEN amendment re-grades:
#       x01_dedup_canonicalized (strip-before-lower canon),
#       x05_binary_features (byte-head oracle), pipeline_dedup_report
#       (composes the amended canon oracle), x05_payload_energy
#       (Arrow/mapInPandas rework — the measured interpreted-HOF
#       finding, SCALE.md round 16), s09_session_gap_replay +
#       s09_session_timeout_replay (the ts-edge wave's
#       pandas-ns-cliff fix: epoch-µs longs across the pandas
#       boundary, timestamps re-cast relationally; these two rows
#       additionally land the round-17 NULL-ts watermark-clamp fix —
#       graded-corpus hashes verified unchanged, ADVICE r16 high),
#       pipeline_clean_coerce (TRY_CAST overflow guard — the
#       hostile-props wave's oracle-crash fix; q17_map_funcs' twin
#       fix lands via its (b) row below);
#   (b) the alphabetically-first 27 of the remaining 42-member r13
#       class (pipeline_posts_clean_wire .. q20_arrow_udf_ttr —
#       x05_binary_features and x05_payload_energy left the pool for
#       their (a) amendment slots) PLUS the round-17
#       x00_adversarial_audit re-grade (its output gained the three
#       dup-key policy-pin probes this round — the changed-output rule
#       mandates a landing-round grade; the slot comes from the (b)
#       tail per the standing velocity rule, ceding q20_udtf_chunks to
#       round 18); the alphabetically-last FIFTEEN roll to round 18
#       per the committed plan below.
# 15 + 7 + 27 + 1 = 50.
#
# ROUND-18 ROTATION PLAN (committed now so no entry waits on an
# undocumented promise; precondition: CORRECTNESS_r17 grades the
# window below 50/50 green). Pure backfill:
#   (a) the FIFTEEN r13 rows that rolled (q20_udtf_chunks — ceded its
#       round-17 slot to the x00 re-grade — plus q21_adamic_adar,
#       q21_adamic_adar_capped, q21_event_transitions, q21_kcore_peel,
#       q21_spend_trend_ols, q22_acf_hourly, q22_hampel_mad,
#       q22_seasonal_decompose, s03_session_window,
#       x01_dedup_content_hash, x02_dedup_clusters,
#       x02_minhash_lsh_neardup, x02_neardup_jaccard, x04_doc_stats);
#   (b) the round-17 registration x05_jpeg_pixel_stats (landing-round
#       grade, drained from QUEUED_FOR_NEXT_WINDOW — the baseline-JPEG
#       seam round-trip) + the alphabetically-first 34 of the
#       46-member r14 class (pipeline_curation_full ..
#       x03_cosine_topk_bruteforce — the 50 r14 rows minus
#       x01_dedup_canonicalized, s09_session_gap_replay,
#       s09_session_timeout_replay, pipeline_clean_coerce, whose
#       amendments re-grade in round 17 above); the
#       alphabetically-last TWELVE (x03_hamming_rerank,
#       x03_hamming_topk, x03_range_search, x04_data_quality_report,
#       x04_fingerprint, x04_hash_sample, x04_language_id,
#       x04_weighted_sample, x05_bmp_pixel_stats, x05_frame_dedup,
#       x05_frame_sample, x05_payload_resize) roll to round 19.
# 15 + 1 + 34 = 50. Every round-17/18 registration must either take a
# slot from the (b) tail in its own commit or add itself to
# QUEUED_FOR_NEXT_WINDOW — keep velocity <= the handful the window
# can absorb.
GRADING_PRIORITY: tuple[str, ...] = (
    # (a) the fifteen rolled r12 rows
    "q21_cohort_ltv",
    "q21_degree_powerlaw",
    "q21_funnel_conversion",
    "q21_next_event_prediction",
    "q21_survival_km",
    "q21_triangle_count",
    "s08_stateful_zscore_replay",
    "x01_dedup_exact_key",
    "x04_global_shuffle",
    "x04_lm_quality_score",
    "x04_quality_percentile_gate",
    "x04_readability",
    "x04_source_caps",
    "x05_byte_histogram",
    "x05_size_binned_shards",
    # (a) the seven round-16 amendment re-grades
    "x01_dedup_canonicalized",
    "x05_binary_features",
    "pipeline_dedup_report",
    "x05_payload_energy",
    "s09_session_gap_replay",
    "s09_session_timeout_replay",
    "pipeline_clean_coerce",
    # (b) the alphabetically-first 28 r13 backfill rows
    "pipeline_posts_clean_wire",
    "q01_scan_explicit_schema",
    "q07_cms_heavy_hitters",
    "q07_hash_aggregate",
    "q07_histogram_quantiles",
    "q09_cube",
    "q09_grouping_sets",
    "q09_rollup",
    "q10_bloom_prune",
    "q10_join_full_outer",
    "q10_join_left_outer",
    "q10_join_semi",
    "q10_star_report",
    "q12_union_by_name",
    "q12_union_daily_slices",
    "q13_rank_dense_rank",
    "q13_topn_per_group",
    "q13_window_share",
    "q14_string_funcs",
    "q14_string_funcs2",
    "q15_datetime_funcs",
    "q17_array_funcs",
    "q17_explode_tokens",
    "q17_json_corrupt_records",
    "q17_map_funcs",
    "q18_partitioned_prune",
    "q20_arrow_udf_ttr",
    # (b) the x00 landing-round re-grade (dup-key policy pins; slot
    # ceded by q20_udtf_chunks, which rolls to round 18)
    "x00_adversarial_audit",
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
        jpeg,
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
