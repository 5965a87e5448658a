"""Query registry: the engine's declared operator surface.

Every implemented operator registers a ``(spark, sf_dir) -> DataFrame``
callable plus (when SQL-expressible) the equivalent ANSI SQL for the
DuckDB oracle. ``__spark_entry__.py`` exposes these to the driver, which
compares row-count + schema + order-insensitive value hash at sf=0.01.

Conventions (oracle-parity rules, SURVEY §7 "hard parts"):
- Alias EVERY computed/aggregate column identically on both sides.
- ``events.ts`` is ns-precision parquet; Spark truncates to µs. Oracle SQL
  must therefore ``CAST(ts AS TIMESTAMP)`` (ns→µs) wherever it is output
  or compared.
- Money sums: round the FINAL aggregate (``round(sum(x), 2)``) — both
  engines then snap to the same double.
- Averages/ratios: round to 4-6 decimals.
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
# ROUND-4 ROTATION PLAN: once CORRECTNESS_r03 lands green, swap this
# list for (a) the never-graded queue pinned in
# tests/test_grading_window.py::QUEUED_FOR_NEXT_WINDOW (round-3
# additions: sequence packing, ngram vocab, incremental neardup,
# training-prep + curation pipelines, payload resize, decontamination,
# repetition metrics, PII scrub, dataset split, chunking, SQ8 top-k,
# salted skew join, tokenize-to-ids), then (b) rotate back in the
# families whose only driver evidence is r02 (q02-q06, q08, remaining
# q01/q07/q09-q12/q17-q18/q21/x01-x03/x05 entries) to refresh them.
GRADING_PRIORITY: tuple[str, ...] = (
    # Q13 window functions (5)
    "q13_topn_per_group",
    "q13_rank_dense_rank",
    "q13_lag_lead",
    "q13_running_frames",
    "q13_window_share",
    # Q14-Q16 scalar batteries (4)
    "q14_string_funcs",
    "q14_string_funcs2",
    "q15_datetime_funcs",
    "q16_math_conditional",
    # Q17 array/map/JSON functions (5)
    "q17_json_funcs",
    "q17_array_funcs",
    "q17_explode_tokens",
    "q17_map_funcs",
    "q17_json_corrupt_records",
    # Q19 upsert (1)
    "q19_upsert_keep_latest",
    # Q20 UDF surface (4)
    "q20_pandas_scalar_udf",
    "q20_apply_in_pandas_zscore",
    "q20_udtf_chunks",
    "q20_arrow_udf_ttr",
    # S1-S6 streaming (batch-equivalent forms) (6)
    "s01_tumbling_window",
    "s02_sliding_window",
    "s03_session_window",
    "s04_watermark_late_drop",
    "s05_stateful_dedup",
    "s06_interval_join",
    # R-layer pipeline wire queries (4)
    "pipeline_posts_clean_wire",
    "pipeline_clean_coerce",
    "pipeline_topk_window",
    "pipeline_daily_ingest",
    # X4 text analysis, the 9 entries without an r02 row (9)
    "x04_term_frequency",
    "x04_tfidf",
    "x04_language_id",
    "x04_quality_filter",
    "x04_token_count",
    "x04_fingerprint",
    "x04_hash_sample",
    "x04_stratified_sample",
    "x04_length_histogram",
    # X5: the round-2 red cell, re-graded after the exact-mean fix (1)
    "x05_corpus_slice",
    # Representatives of already-green families (11)
    "q01_scan_explicit_schema",
    "q07_hash_aggregate",
    "q09_grouping_sets",
    "q10_star_report",
    "q11_asof_join",
    "q12_except_all",
    "q18_sink_roundtrip",
    "q21_cohort_retention",
    "x01_dedup_content_hash",
    "x02_minhash_lsh_neardup",
    "x03_cosine_topk_bruteforce",
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
        upsert,
        windows,
    )
    from .functions import scalar, text, udfs  # noqa: F401
    from .streaming import stream_queries  # noqa: F401
    from .transforms import posts  # noqa: F401
