"""Guard: the driver's 50-entry correctness window is a reviewed artifact.

Round 2 discovered the driver grades at most the first 50 entries of
``queries()`` in dict order — and 38 registered queries had silently
never received a correctness row because import order, not intent,
decided the window. These tests make that impossible to regress:

1. The first 50 of ``queries()`` must equal ``registry.GRADING_PRIORITY``
   exactly — adding a query can never silently displace a graded one.
2. Every SURVEY §2 family must have driver evidence: at least one entry
   inside the current window, or all-green rows in a committed past
   CORRECTNESS file. A family with neither fails loudly.

No SparkSession needed: these are pure registry/metadata checks.
"""

from __future__ import annotations

import json
import pathlib
import re

import pytest

from reddit_data_engineering_project_spark import registry

registry.load_all_operators()

REPO = pathlib.Path(__file__).resolve().parent.parent

# SURVEY §2 family = the name prefix before the first underscore
# (q01..q21, s01..s06 collapse to the S-family rows, x01..x05,
# pipeline_* is the R-layer).
_FAMILY_RE = re.compile(r"^(q\d+|s\d+|x\d+|pipeline)")


def family_of(name: str) -> str:
    m = _FAMILY_RE.match(name)
    assert m, f"query name {name!r} does not map to a SURVEY §2 family"
    return m.group(1)


def _past_green_families() -> set[str]:
    """Families where EVERY registered entry has a green row (hash pass,
    or declared rows-only) in some committed CORRECTNESS_r*.json."""
    greens: dict[str, set[str]] = {}
    for path in sorted(REPO.glob("CORRECTNESS_r*.json")):
        try:
            rows = json.loads(path.read_text())
        except (OSError, json.JSONDecodeError):
            continue
        if not isinstance(rows, dict):
            continue
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            ok = row.get("hash_match") is True or (
                row.get("err") == "no_oracle"
                and name not in registry.ORACLES  # rows-only by design
            )
            if ok:
                greens.setdefault(name, set()).add(path.name)
    out = set()
    for fam in {family_of(n) for n in registry.QUERIES}:
        members = [n for n in registry.QUERIES if family_of(n) == fam]
        if all(m in greens for m in members):
            out.add(fam)
    return out


def test_priority_names_are_registered_and_unique():
    names = registry.GRADING_PRIORITY
    assert len(names) == len(set(names)) == registry.GRADED_WINDOW
    missing = [n for n in names if n not in registry.QUERIES]
    assert not missing, f"GRADING_PRIORITY names not registered: {missing}"


def test_window_is_exactly_the_priority_list():
    ordered = list(registry.ordered_queries())
    assert (
        tuple(ordered[: registry.GRADED_WINDOW]) == registry.GRADING_PRIORITY
    ), "first 50 queries() entries drifted from GRADING_PRIORITY"
    # and nothing was dropped: every registration still appears
    assert set(ordered) == set(registry.QUERIES)


def test_every_family_has_driver_evidence():
    window = set(registry.GRADING_PRIORITY)
    in_window = {family_of(n) for n in window}
    past_green = _past_green_families()
    all_fams = {family_of(n) for n in registry.QUERIES}
    uncovered = sorted(all_fams - in_window - past_green)
    assert not uncovered, (
        f"families with no driver evidence (not in the graded window and "
        f"no all-green past CORRECTNESS rows): {uncovered}"
    )


# Queries registered after a window was pinned: consciously queued for
# the next window rotation (they hold check_oracle + pytest coverage
# meanwhile). Adding a name here is the explicit act the guard demands —
# silent additions fail the test below. The round-6 rotation moved the
# entire 21-entry round-3 queue into the graded window; the entries
# below are round-6 NEW registrations awaiting the round-7 rotation.
QUEUED_FOR_NEXT_WINDOW: set[str] = {
    "x04_quality_percentile_gate",  # round-6 addition: adaptive gate
    "pipeline_split_leakage_audit",  # round-6 addition: eval integrity
    "x04_data_quality_report",  # round-6 addition: constraint audit
    "q21_dau_wau_stickiness",  # round-6 addition: growth accounting
    "x05_size_binned_shards",  # round-6 addition: media sharding
    "x02_dedup_keep_best",  # round-6 addition: quality-aware survivor
    "x04_boilerplate_removal",  # round-7 addition: cross-doc line dedup
    "x04_global_shuffle",  # round-7 addition: training-order shuffle
    "q19_cdc_apply",  # round-7 addition: changelog apply w/ tombstones
    "x04_bm25_scores",  # round-7 addition: lexical retrieval scoring
    "q21_copurchase_lift",  # round-7 addition: market-basket lift
    "q21_part_pagerank",  # round-7 addition: integer PageRank
    "q10_local_supplier_volume",  # round-7 addition: TPC-H Q5 topology
    "x04_lm_quality_score",  # round-7 addition: bigram-LM quality gate
    "x02_fuzzy_levenshtein_neardup",  # round-7 addition: edit-dist rung
    "q21_sessionize_gap",  # round-7 addition: batch sessionization
    "q22_timeseries_gapfill",  # round-7 addition: hourly zero-fill grid
    "q22_rolling_zscore",  # round-7 addition: trailing-window anomaly
    "x04_bpe_pair_stats",  # round-7 addition: BPE merge-pair census
    "x04_char_entropy",  # round-7 addition: char-entropy quality signal
    "x03_pq_topk",  # round-7 addition: product-quantized ANN
    "q19_incremental_agg_maintain",  # round-7 addition: MV delta merge
    "q22_locf_fill",  # round-7 addition: carry-forward interpolation
    "pipeline_events_monitor",  # round-7 addition: composed monitor
    "q21_activity_streaks",  # round-7 addition: consecutive-day streaks
    "q07_winsorized_stats",  # round-7 addition: robust clipped stats
    "q13_percent_rank_cume",  # round-7 addition: relative-rank analytics
    "q21_copurchase_reach2",  # round-7 addition: 2-hop reachability
    "q09_unpivot",  # round-7 addition: wide-to-long unpivot
    "q17_map_funcs",  # ceded its window slot to q15_datetime_funcs2
    "q16_bitwise_funcs",  # round-7 addition: bitwise/popcount battery
    "q13_range_interval_frames",  # round-7 addition: RANGE time frames
    "x04_source_caps",  # round-7 addition: per-source domain cap
    "q21_triangle_count",  # round-7 addition: triangle counting
    "q21_rfm_segments",  # round-7 addition: RFM quartile segmentation
    "x04_readability",  # round-7 addition: Flesch readability signal
    "q22_ewma_window",  # round-7 addition: finite-horizon EWMA
    "x03_kmeans_step",  # round-7 addition: Lloyd-iteration clustering
    "q07_heavy_hitters",  # round-7 addition: key-skew diagnostic
    "x04_bpe_merge_apply",  # round-7 addition: full BPE iteration
    "q11_asof_tolerance",  # round-7 addition: staleness-bounded as-of
    "q21_spend_trend_ols",  # round-7 addition: exact-integer OLS trend
    "q03_filter_predicates",  # ceded its window slot to s07_windowed_topk
    "q21_next_event_prediction",  # round-7 addition: Markov argmax
    "x02_containment_pairs",  # round-7 addition: subset/quote detection
    "q10_join_null_safe",  # round-7 addition: null-safe equality join
    "x05_byte_histogram",  # round-7 addition: payload byte census
    "x03_knn_classify",  # round-7 addition: k-NN majority-vote labels
    "q12_table_diff",  # round-7 addition: keyed reconciliation diff
    "pipeline_feature_store",  # round-7 addition: composed feature table
    "q21_ab_lift_ztest",  # round-7 addition: two-proportion experiment test
    "q13_value_functions",  # round-7 addition: first/last/nth IGNORE NULLS
    "q05_multikey_sort",  # ceded its window slot to q14_string_funcs3
    "q22_cusum_drift",  # round-7 addition: CUSUM change detection
    "x04_feature_hashing",  # round-7 addition: hashing-trick BoW vectors
    "q07_mode_exact",  # round-7 addition: deterministic per-group mode
    "q08_count_distinct",  # ceded its window slot to x01_dedup_canonicalized
    "q21_attribution_last_touch",  # round-7 addition: revenue attribution
    "q17_higher_order_funcs",  # round-7 addition: HOF lambda battery
    "q20_map_in_arrow",  # round-7 addition: Arrow RecordBatch seam
    "q07_corr_exact_moments",  # round-7 addition: portable Pearson corr
    "x03_ann_recall_report",  # round-7 addition: in-engine recall@k audit
    "q22_seasonal_naive",  # round-7 addition: forecast baseline backtest
    "pipeline_dedup_report",  # round-7 addition: composed dedup audit
    "q16_null_semantics",  # round-7 addition: three-valued-logic battery
    "x05_frame_dedup",  # round-7 addition: repeated-segment detection
    "q21_ab_power_analysis",  # round-7 addition: MDE / sample sizing
}


def test_previously_ungraded_entries_are_all_in_window():
    """The 38 round-2 ungraded entries + the re-fixed red cell must all
    sit inside the graded window this round; anything else never-graded
    must be explicitly queued for the next rotation."""
    never_graded = {
        n
        for n in registry.QUERIES
        if not any(
            n in json.loads(p.read_text())
            for p in REPO.glob("CORRECTNESS_r*.json")
        )
    }
    window = set(registry.GRADING_PRIORITY)
    left_out = sorted(never_graded - window - QUEUED_FOR_NEXT_WINDOW)
    assert not left_out, (
        f"never-graded queries outside window and not explicitly queued: "
        f"{left_out}"
    )
    assert "x05_corpus_slice" in window  # the round-2 red cell, re-fixed


@pytest.mark.parametrize("name", sorted(registry.ORACLES))
def test_oracle_entries_have_query(name):
    assert name in registry.QUERIES
