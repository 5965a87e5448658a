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
# ROUND-14 WINDOW (executes the committed round-14 rotation plan
# verbatim — r13 verdict "Next round" item 1; precondition held:
# CORRECTNESS_r13 graded the round-13 window 50/50 green). Pure
# backfill plus the one queued registration:
#   (a) the nine remaining r09 rows (x03_cosine_topk_bruteforce,
#       x03_hamming_rerank, x03_hamming_topk, x03_range_search,
#       x04_fingerprint, x04_hash_sample, x04_language_id,
#       x04_weighted_sample, x05_frame_sample);
#   (b) the round-13 registration x05_bmp_pixel_stats (landing-round
#       grade, drained from QUEUED_FOR_NEXT_WINDOW; round 14 extends it
#       with planted-PPM sibling rows per r13 verdict item 3, so the
#       landing grade covers BOTH real codecs) + the three round-13
#       nullity-amendment re-grades (x04_data_quality_report,
#       x05_frame_dedup, x05_payload_resize) + the alphabetically-first
#       37 of the 49 entries whose latest green is r10
#       (pipeline_clean_coerce .. x02_incremental_neardup); the
#       alphabetically-last TWELVE (x02_simhash_neardup,
#       x02_simhash16_neardup, x03_sq8_topk, x04_chunking,
#       x04_corpus_profile, x04_dataset_split, x04_length_histogram,
#       x04_quality_filter, x04_stratified_sample, x04_term_frequency,
#       x04_tfidf, x04_token_count) roll to round 15 per the committed
#       plan (the x02/x03/x04 families keep fresh evidence via r13
#       rows and round-14 (a)-slots).
# 9 + 1 + 3 + 37 = 50.
#
# ROUND-15 ROTATION PLAN (committed now so no entry waits on an
# undocumented promise; precondition: CORRECTNESS_r14 grades the
# window below 50/50 green). Backfill plus ELEVEN round-14 amendment
# re-grades, same mechanism as the r13 nullity re-grades (code
# changed, graded-corpus hashes verified unchanged by full post-fix
# sf0.01 sweeps — 208 ok / 0 fail — but each latest green row
# describes superseded code):
#   (a) the twelve r10 rows that rolled from the round-14 (b) tail
#       (x02_simhash_neardup, x02_simhash16_neardup, x03_sq8_topk,
#       x04_chunking, x04_corpus_profile, x04_dataset_split,
#       x04_length_histogram, x04_quality_filter, x04_stratified_sample,
#       x04_term_frequency, x04_tfidf, x04_token_count — x03_sq8_topk's
#       row additionally lands the round-14 NULL-embedding exclusion,
#       whose code it shares, and x04_corpus_profile's row lands the
#       round-14 n_too_short when/otherwise(0) fix the all-NULL-n_chars
#       corpus caught);
#   (b) the ELEVEN amendment re-grades: x00_adversarial_audit (round 14
#       extended the sentinel with the null_concat probe — the
#       concat_ws-on-NULL digest law the null-source sweep caught) and
#       the TEN vector entries the null-embedding hostile corpus
#       reworked (un-embedded rows now prune before any vector op, the
#       oracle mirroring WHERE embedding IS NOT NULL; the other four
#       vector entries — x03_cosine_topk_bruteforce, x03_hamming_rerank,
#       x03_hamming_topk, x03_range_search — hold round-14 (a) slots,
#       so they land the same fix this round): x02_embedding_neardup,
#       x02_semantic_dedup, x03_ann_lsh_bucketed, x03_ann_recall_report,
#       x03_ivf_topk, x03_ivfpq_topk, x03_kmeans_step, x03_knn_classify,
#       x03_pairwise_label_centroids, x03_pq_topk — PLUS the
#       alphabetically-first 27 of the 45 remaining entries whose
#       latest green will then be r11 (pipeline_dedup_report ..
#       q22_locf_fill — the r11 class minus x04_data_quality_report and
#       x05_payload_resize, re-graded in round 14, and minus the
#       amendment members above); the remaining EIGHTEEN r11 rows
#       (q22_seasonal_naive .. x05_corpus_slice, incl. x04_char_entropy
#       which ceded earlier in the round) roll to round 16 — the
#       x02/x04/x05 families keep round-14/15 evidence via this
#       window's (a)/(b) rows.
# 12 + 11 + 27 = 50. Every round-14/15 registration must either take a
# slot from the (b) tail in its own commit or add itself to
# QUEUED_FOR_NEXT_WINDOW — keep velocity <= the handful the window can
# absorb.
GRADING_PRIORITY: tuple[str, ...] = (
    # (a) the nine remaining r09 rows
    "x03_cosine_topk_bruteforce",
    "x03_hamming_rerank",
    "x03_hamming_topk",
    "x03_range_search",
    "x04_fingerprint",
    "x04_hash_sample",
    "x04_language_id",
    "x04_weighted_sample",
    "x05_frame_sample",
    # (b) the BMP+PPM round-trip landing grade + the three nullity
    # re-grades + the first-37 r10 backfill, alphabetical
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
    "s04_watermark_late_drop",
    "s05_stateful_dedup",
    "s06_interval_join",
    "s07_windowed_topk",
    "s09_session_gap_replay",
    "s09_session_timeout_replay",
    "x01_dedup_canonicalized",
    "x02_incremental_neardup",
    "x04_data_quality_report",
    "x05_bmp_pixel_stats",
    "x05_frame_dedup",
    "x05_payload_resize",
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
