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
# ROUND-13 WINDOW (executes the committed round-13 plan, amended per
# the round-12 verdict item 2; precondition held: CORRECTNESS_r12
# graded the round-12 window 50/50 green). Pure backfill plus two
# verdict-mandated re-grades:
#   (a) the eight remaining r08 rows;
#   (b) 40 of the alphabetically-first 42 entries whose latest green
#       is r09 (pipeline_posts_clean_wire .. x02_neardup_jaccard), PLUS
#       the two entries whose semantics changed in round 12 without a
#       landing-round grade (round-12 verdict "What's wrong" #1):
#       s03_session_window (oracle now splits on strict > gap — Spark's
#       F.session_window merges touching windows, commit 9d0ccc8) and
#       q21_spend_trend_ols (regression re-anchored on dated purchases,
#       commit cda0e90). They take the two alphabetically-last slots of
#       the committed (b) list — x03_cosine_topk_bruteforce and
#       x03_hamming_rerank roll to round 14 (the x03 family keeps five
#       (a)-slots of round-13 evidence, so no family goes dark).
# 8 + 40 + 2 = 50.
#
# ROUND-14 ROTATION PLAN (committed now so no entry waits on an
# undocumented promise; precondition: CORRECTNESS_r13 grades the
# window below 50/50 green). Pure backfill plus the one queued
# registration:
#   (a) the nine remaining r09 rows (x03_cosine_topk_bruteforce,
#       x03_hamming_rerank, x03_hamming_topk, x03_range_search,
#       x04_fingerprint, x04_hash_sample, x04_language_id,
#       x04_weighted_sample, x05_frame_sample);
#   (b) the round-13 registration x05_bmp_pixel_stats (landing-round
#       grade, QUEUED_FOR_NEXT_WINDOW) + THREE round-13 amendment
#       re-grades, same mechanism as the r12 seam re-grades (code
#       changed, graded-corpus hashes verified unchanged by a full
#       post-fix sf0.01 sweep, but each latest green row describes
#       superseded code): x04_data_quality_report (nullity sweep:
#       predicate-cast sums emitted NULL instead of 0 on an all-NULL
#       column; now when/otherwise(0)), x05_frame_dedup and
#       x05_payload_resize (null-text sweep: NULL payloads crashed the
#       mapInPandas feature passes; payload-less rows now prune BEFORE
#       the Python boundary, oracles mirror IS NOT NULL — the three
#       null-text-touched entries already in the r13 window
#       [q17_array_funcs, q20_arrow_udf_ttr, x05_binary_features] grade
#       this round, and x05_frame_sample holds a round-14 (a) slot) +
#       the alphabetically-first 37 of the 49 entries whose latest
#       green will then be r10 (pipeline_clean_coerce .. — the r10
#       class minus s03_session_window, re-graded this round); the
#       alphabetically-last TWELVE (x02_simhash_neardup,
#       x02_simhash16_neardup, x03_sq8_topk — ceding slots to the three
#       re-grades; the x02/x03 families keep fresh evidence via three
#       r13-window rows and five round-14 (a)-slots respectively — plus
#       x04_chunking, x04_corpus_profile, x04_dataset_split,
#       x04_length_histogram, x04_quality_filter, x04_stratified_sample,
#       x04_term_frequency, x04_tfidf, x04_token_count — the x04 family
#       keeps round-13 evidence via its (a)-slot x04_doc_stats) roll to
#       round 15.
# 9 + 1 + 3 + 37 = 50. Every round-13/14 registration must either take
# a slot from the (b) tail in its own commit or add itself to
# QUEUED_FOR_NEXT_WINDOW — keep velocity <= the handful the window can
# absorb.
GRADING_PRIORITY: tuple[str, ...] = (
    # (a) the eight remaining r08 rows
    "x03_ivfpq_topk",
    "x03_kmeans_step",
    "x03_knn_classify",
    "x03_pairwise_label_centroids",
    "x03_pq_topk",
    "x04_doc_stats",
    "x05_binary_features",
    "x05_payload_energy",
    # (b) backfill: alphabetically-first r09 rows + the two round-12
    # semantics-changed re-grades (s03_session_window,
    # q21_spend_trend_ols) in their alphabetical positions
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
    "q20_udtf_chunks",
    "q21_adamic_adar",
    "q21_adamic_adar_capped",
    "q21_event_transitions",
    "q21_kcore_peel",
    "q21_spend_trend_ols",
    "q22_acf_hourly",
    "q22_hampel_mad",
    "q22_seasonal_decompose",
    "s03_session_window",
    "x00_adversarial_audit",
    "x01_dedup_content_hash",
    "x02_dedup_clusters",
    "x02_minhash_lsh_neardup",
    "x02_neardup_jaccard",
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
