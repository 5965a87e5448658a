"""Invariant tests for the time-series + sessionization + fuzzy-dedup
operators (round-7 additions).

The oracle gate pins exact values on the fixture corpus; these tests pin
the SEMANTIC contracts on crafted inputs the fixtures cannot exhibit:
the exact 30-minute session-boundary edge (inclusive vs exclusive),
zero-fill rows for silent hours, the bounded rolling frame and its
constant-input NULL guard, and the blocking/threshold contract of the
edit-distance near-dup.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from reddit_data_engineering_project_spark.operators import (
    dedup,
    product_analytics,
    timeseries,
)

from conftest import SF_DIR


def _write_events(spark, tmp_path, rows):
    """rows: (event_id, ts_iso, user_id, event_type, value)"""
    df = spark.createDataFrame(
        [
            Row(
                event_id=r[0],
                ts=r[1],
                user_id=r[2],
                event_type=r[3],
                value=float(r[4]),
                props="{}",
            )
            for r in rows
        ]
    ).withColumn("ts", F.to_timestamp("ts"))
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    return str(tmp_path)


def _write_documents(spark, tmp_path, rows):
    """rows: (doc_id, text, lang)"""
    df = spark.createDataFrame(
        [
            Row(doc_id=r[0], text=r[1], lang=r[2], source="s", n_chars=len(r[1]))
            for r in rows
        ]
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


# --------------------------------------------------------------- sessionize


def test_session_splits_strictly_after_30min(spark, tmp_path):
    """Gap of exactly 1800 s stays ONE session (boundary is >, not >=);
    1800 s + 1 µs starts a new one."""
    sf = _write_events(
        spark,
        tmp_path,
        [
            (1, "2024-01-01 00:00:00", 7, "view", 1.0),
            (2, "2024-01-01 00:30:00", 7, "view", 1.0),  # exactly 1800 s
            (3, "2024-01-01 01:00:00.000001", 7, "view", 1.0),  # 1800.000001
        ],
    )
    out = product_analytics.q21_sessionize_gap(spark, sf).collect()
    by_seq = {r.session_seq: r for r in out}
    assert set(by_seq) == {1, 2}
    assert by_seq[1].n_events == 2 and by_seq[2].n_events == 1
    assert by_seq[1].duration_s == 1800


def test_sessions_do_not_cross_users(spark, tmp_path):
    sf = _write_events(
        spark,
        tmp_path,
        [
            (1, "2024-01-01 00:00:00", 1, "view", 2.0),
            (2, "2024-01-01 00:05:00", 2, "view", 3.0),
        ],
    )
    out = product_analytics.q21_sessionize_gap(spark, sf).collect()
    assert len(out) == 2
    assert all(r.session_seq == 1 and r.n_events == 1 for r in out)
    assert {r.value_e2 for r in out} == {200, 300}


# ------------------------------------------------------------------ gapfill


def test_gapfill_emits_zero_rows_for_silent_hours(spark, tmp_path):
    sf = _write_events(
        spark,
        tmp_path,
        [
            (1, "2024-01-01 00:10:00", 1, "view", 1.5),
            (2, "2024-01-01 03:20:00", 1, "view", 2.5),
        ],
    )
    out = timeseries.q22_timeseries_gapfill(spark, sf).collect()
    # 4 hours (00..03) x 1 type, silent hours 01 and 02 explicit zeros
    assert len(out) == 4
    by_hour = {r.hour.hour: r for r in out}
    assert by_hour[0].n_events == 1 and by_hour[0].value_e2 == 150
    assert by_hour[1].n_events == 0 and by_hour[1].value_e2 == 0
    assert by_hour[2].n_events == 0
    assert by_hour[3].n_events == 1 and by_hour[3].value_e2 == 250


def test_gapfill_grid_is_dense_per_type(spark, tmp_path):
    """Every (hour, type) cell exists even when a type never fired in
    that hour — grid cardinality is |hours| x |types| exactly."""
    sf = _write_events(
        spark,
        tmp_path,
        [
            (1, "2024-01-01 00:00:00", 1, "view", 1.0),
            (2, "2024-01-01 01:00:00", 1, "click", 1.0),
        ],
    )
    out = timeseries.q22_timeseries_gapfill(spark, sf)
    assert out.count() == 2 * 2
    assert out.filter("n_events = 0").count() == 2


# ------------------------------------------------------------ rolling zscore


def test_zscore_null_on_constant_frame_and_first_row(spark, tmp_path):
    sf = _write_events(
        spark,
        tmp_path,
        [(i, f"2024-01-01 00:0{i}:00", 1, "view", 5.0) for i in range(1, 5)],
    )
    out = timeseries.q22_rolling_zscore(spark, sf).collect()
    assert all(r.z_e4 is None for r in out)  # zero variance everywhere


def test_zscore_known_value(spark, tmp_path):
    """Frame [1, 1, 4]: mean 2, std sqrt(3) -> z = 2/sqrt(3) = 1.1547."""
    sf = _write_events(
        spark,
        tmp_path,
        [
            (1, "2024-01-01 00:01:00", 1, "view", 1.0),
            (2, "2024-01-01 00:02:00", 1, "view", 1.0),
            (3, "2024-01-01 00:03:00", 1, "view", 4.0),
        ],
    )
    out = {r.event_id: r for r in timeseries.q22_rolling_zscore(spark, sf).collect()}
    assert out[3].z_e4 == 11547
    assert out[1].z_e4 is None  # single-row frame
    assert out[2].z_e4 is None  # constant two-row frame


def test_zscore_frame_is_bounded_at_8(spark, tmp_path):
    """Row 10's frame covers rows 3..10 only: an early outlier at row 1
    must NOT influence it — z for a frame-constant tail is NULL."""
    rows = [(1, "2024-01-01 00:00:01", 1, "view", 1000.0)] + [
        (i, f"2024-01-01 00:00:{i:02d}", 1, "view", 5.0) for i in range(2, 11)
    ]
    sf = _write_events(spark, tmp_path, rows)
    out = {r.event_id: r for r in timeseries.q22_rolling_zscore(spark, sf).collect()}
    assert out[10].z_e4 is None  # outlier aged out of the 8-row frame


# ---------------------------------------------------------------- fuzzy dedup


def test_fuzzy_neardup_pairs_within_threshold_same_block(spark, tmp_path):
    base = "shared prefix body of the document text"
    sf = _write_documents(
        spark,
        tmp_path,
        [
            (1, base, "en"),
            (2, base + "!", "en"),  # distance 1, same prefix8
            (3, "shared p" + "X" * 60, "en"),  # same block, distance > 10
            (4, base, "de"),  # same text, different lang block
        ],
    )
    out = dedup.x02_fuzzy_levenshtein_neardup(spark, sf).collect()
    assert [(r.doc_a, r.doc_b, r.edit_dist) for r in out] == [(1, 2, 1)]


def test_fuzzy_neardup_blocking_excludes_different_prefixes(spark, tmp_path):
    """Distance-1 pair whose first 8 chars differ is (by design) not a
    candidate — the blocking contract, documented recall bound."""
    sf = _write_documents(
        spark,
        tmp_path,
        [(1, "Abcdefgh same tail", "en"), (2, "Xbcdefgh same tail", "en")],
    )
    assert dedup.x02_fuzzy_levenshtein_neardup(spark, sf).count() == 0


def test_new_ops_run_on_fixture_corpus(spark):
    """Smoke on the real sf0.001 fixtures: non-empty, stable schemas."""
    assert product_analytics.q21_sessionize_gap(spark, SF_DIR).count() > 0
    assert timeseries.q22_timeseries_gapfill(spark, SF_DIR).count() > 0
    assert timeseries.q22_rolling_zscore(spark, SF_DIR).count() > 0


# -------------------------------------------------- incremental maintenance


def test_incremental_merge_equals_full_recompute(spark):
    """The maintained state (base < cutoff merged with delta >= cutoff)
    must equal the direct full rollup — the self-maintainability
    contract that justifies never rescanning history."""
    from pyspark.sql import functions as F

    from reddit_data_engineering_project_spark.operators import upsert
    from reddit_data_engineering_project_spark.tables import table

    maintained = upsert.q19_incremental_agg_maintain(spark, SF_DIR)
    ev = table(spark, SF_DIR, "events")
    full = ev.groupBy("user_id", "event_type").agg(
        F.count("*").alias("n_events")
    )
    m = {(r.user_id, r.event_type): r.n_events for r in maintained.collect()}
    f = {(r.user_id, r.event_type): r.n_events for r in full.collect()}
    assert m == f


# ------------------------------------------------------------------- LOCF


def test_locf_carries_last_value_and_marks_fills(spark, tmp_path):
    sf = _write_events(
        spark,
        tmp_path,
        [
            (1, "2024-01-01 00:10:00", 1, "view", 2.0),
            (2, "2024-01-01 03:20:00", 1, "view", 4.0),
        ],
    )
    from reddit_data_engineering_project_spark.operators import timeseries

    out = {r.hour.hour: r for r in timeseries.q22_locf_fill(spark, sf).collect()}
    assert out[0].locf_value_e4 == 20000 and out[0].is_filled is False
    assert out[1].locf_value_e4 == 20000 and out[1].is_filled is True
    assert out[2].locf_value_e4 == 20000 and out[2].is_filled is True
    assert out[3].locf_value_e4 == 40000 and out[3].is_filled is False


def test_locf_leading_gap_stays_null(spark, tmp_path):
    """Hours before a type's first observation have nothing to carry:
    click's hour-0 cell stays NULL while view's carries."""
    sf = _write_events(
        spark,
        tmp_path,
        [
            (1, "2024-01-01 00:00:00", 1, "view", 1.0),
            (2, "2024-01-01 01:00:00", 1, "click", 3.0),
        ],
    )
    from reddit_data_engineering_project_spark.operators import timeseries

    rows = timeseries.q22_locf_fill(spark, sf).collect()
    cell = {(r.hour.hour, r.event_type): r.locf_value_e4 for r in rows}
    assert cell[(0, "click")] is None
    assert cell[(1, "click")] == 30000
    assert cell[(0, "view")] == 10000 and cell[(1, "view")] == 10000
