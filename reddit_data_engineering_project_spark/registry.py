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
# ROUND-6 ROTATION (executes the plan the round-5 verdict re-ordered):
#   (a) the 21 never-graded LLM-pipeline entries queued since round 3
#       (sequence packing, ngram vocab, incremental neardup,
#       training-prep + curation pipelines, payload resize,
#       decontamination, repetition metrics, PII scrub, dataset split,
#       chunking, SQ8 top-k, salted skew join, tokenize-to-ids, mixing
#       rebalance, shard export, SCD2, Z-order key, ORC/XML scans,
#       corpus profile);
#   (b) the two chronic hash-fails re-graded after the type-alignment
#       fix (q16_math_conditional, x05_corpus_slice);
#   (c) the 20 events-family entries that errored in r04/r05 on the
#       regenerated corpus — their only green rows predate the fixture
#       regeneration, so they stay in-window to earn current evidence
#       now that the loader handles the µs corpus;
#   (d) 6 stale-family representatives (q02-q06, q08) whose only
#       evidence is r02 against the OLD corpus, plus x02_simhash
#       (perf-reworked in commit 375ef21, correctness never re-graded).
# Rotated out: families with green r05 rows on the current corpus
# (q01 parquet scan, q07, q09, q10 star, q13 top-n/rank/share, q14, q15,
# q17 array/explode/corrupt, q20 udtf/arrow, pipeline_posts_clean_wire,
# x01, x02 minhash, x03 brute-force, 9 x04 entries).
#
# ROUND-7 STATUS: the driver never produced CORRECTNESS_r06 /
# BENCH_r06 artifacts, so the round-6 window below has ZERO driver
# evidence — it stays in place for round 7 with FOUR targeted swaps
# (each commented inline at its slot): new operator FAMILIES and new
# members of previously-all-green families need first-ever evidence,
# so s07_windowed_topk, q14_string_funcs3, q15_datetime_funcs2, and
# x01_dedup_canonicalized took slots ceded by low-risk re-grades
# (q03/q05/q08 reps, q17_map_funcs) that keep green r02/r03 rows and
# re-grade in round 8. The window still holds the never-graded
# 21-entry payload, both chronic hash-fails, and the events-family
# re-grades the round-5 verdict ordered. The rotation plan below
# executes in round 8, conditional on CORRECTNESS_r07 landing green.
#
# ROUND-8 ROTATION PLAN (was round-7; execute once a green
# CORRECTNESS_r{N} exists for this window):
#   (a) ALL round-6 new registrations queued in
#       tests/test_grading_window.py::QUEUED_FOR_NEXT_WINDOW — that set
#       is the authoritative list (do NOT enumerate it here; it grew
#       during round 6 and a stale enumeration would under-rotate) —
#       plus the two rows-only-to-oracle upgrades needing fresh hash
#       evidence (x03_ann_lsh_bucketed, x03_ivf_topk);
#   (b) old-corpus-only leftovers whose last evidence is r02/r03
#       (q01 csv/json scans, q07_percentiles, q08 approx/pairs,
#       q09 cube/pivot/rollup, q10 join battery variants,
#       q11_range_join_bands, q12 unions/intersect,
#       q17_adhoc_sql_correlated, q21 transitions/funnel,
#       x01_dedup_exact_key, x02 clusters/embedding/jaccard,
#       x03_pairwise_label_centroids, x04_doc_stats) — plus the seven
#       that ceded round-7 window slots to new families/members:
#       q02_projection_pruning, q04_topk, q06_limit_offset,
#       q03_filter_predicates (→ s07_windowed_topk),
#       q05_multikey_sort (→ q14_string_funcs3),
#       q08_count_distinct (→ x01_dedup_canonicalized),
#       q17_map_funcs (→ q15_datetime_funcs2);
#   (c) keep ≥1 green r06 representative per family for continuity.
GRADING_PRIORITY: tuple[str, ...] = (
    # (a) the 21-entry queued rotation payload
    "x04_sequence_packing",
    "x04_ngram_vocab",
    "x04_decontamination",
    "x04_repetition_metrics",
    "x04_pii_scrub",
    "x04_dataset_split",
    "x04_chunking",
    "x04_tokenize_to_ids",
    "x04_mixing_rebalance",
    "x04_corpus_profile",
    "x02_incremental_neardup",
    "x03_sq8_topk",
    "x05_payload_resize",
    "q10_join_salted_skew",
    "q18_export_training_shards",
    "q18_zorder_key",
    "q19_scd2_history",
    "q01_orc_scan",
    "q01_xml_scan",
    "pipeline_training_prep",
    "pipeline_curation_full",
    # (b) chronic hash-fails, re-graded after the type-alignment fix
    "q16_math_conditional",
    "x05_corpus_slice",
    # (c) events-family re-grades on the regenerated corpus
    "q11_asof_join",
    "q12_except_all",
    "q13_lag_lead",
    # q13_running_frames ceded its re-grade slot to q09_unpivot (new
    # q09 member needs family evidence; q13 keeps lag_lead as its
    # representative) — re-grades in round 8 with the (b) list.
    "q09_unpivot",
    "q17_json_funcs",
    # q17_map_funcs ceded its re-grade slot to q15_datetime_funcs2 (new
    # q15 member needs family evidence; q17 keeps json_funcs as its
    # events re-grade representative) — map_funcs re-grades in round 8.
    "q15_datetime_funcs2",
    "q18_sink_roundtrip",
    "q19_upsert_keep_latest",
    "q20_pandas_scalar_udf",
    "q20_apply_in_pandas_zscore",
    "q21_cohort_retention",
    "s01_tumbling_window",
    "s02_sliding_window",
    "s03_session_window",
    "s04_watermark_late_drop",
    "s05_stateful_dedup",
    "s06_interval_join",
    "pipeline_clean_coerce",
    "pipeline_topk_window",
    "pipeline_daily_ingest",
    # (d) stale families (old-corpus r02 evidence only) + SimHash rework
    # q03_filter_predicates ceded its re-grade slot to s07_windowed_topk
    # (new single-member streaming family needs first-ever evidence; q03
    # keeps green r02 rows and the filter grammar is the most-fuzzed
    # surface in tests/test_differential_fuzz.py) — re-grades round 8.
    "s07_windowed_topk",
    # q05_multikey_sort ceded its re-grade slot to q14_string_funcs3
    # (new q14 member needs family evidence; q05 keeps green r02 rows)
    # — re-grades in round 8 with the other (d)-group leftovers.
    "q14_string_funcs3",
    # q08_count_distinct ceded its re-grade slot to x01_dedup_canonicalized
    # (new x01 member needs family evidence; all q08 members keep green
    # r02 rows and the q08 code is unchanged since) — re-grades round 8.
    "x01_dedup_canonicalized",
    "x02_simhash_neardup",
    # q07_weighted_median holds the family-evidence slot for Q7 (its
    # registration would otherwise leave q07 with neither window nor
    # all-green-past coverage); q02_projection_pruning ceded the slot
    # (single-member family, r02 all-green) and re-grades in round 8
    # with q04/q06.
    "q07_weighted_median",
    # (e) the new Q22 time-series family needs first-ever driver rows;
    #     q04_topk / q06_limit_offset ceded their re-grade slots (both
    #     single-member families with r02 all-green evidence and
    #     corpus-independent semantics) — fold them into the round-8
    #     rotation's (b) list.
    "q22_timeseries_gapfill",
    "q22_rolling_zscore",
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
