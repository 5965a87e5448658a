"""Property-based invariants for sessionization and the time-series grid
(hypothesis over random event sets — the crafted-input tests pin edges,
these pin algebraic invariants on arbitrary shapes).

Examples are capped low: every example runs Spark jobs, so the budget
goes to input diversity (random gaps straddling the 30-min boundary,
duplicate timestamps, multi-user interleavings), not repetition.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import Row, functions as F

from reddit_data_engineering_project_spark.operators import (
    product_analytics,
    timeseries,
)

_BASE = dt.datetime(2024, 1, 1)

# Random event sets: 1-3 users, 1-12 events each, offsets up to 3 hours
# with second granularity so gaps land on both sides of the 1800 s line.
_events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),  # user_id
        st.integers(min_value=0, max_value=3 * 3600),  # offset seconds
        st.floats(
            min_value=-100, max_value=100, allow_nan=False, width=32
        ),  # value
    ),
    min_size=1,
    max_size=12,
)


def _write(spark, tmp_path, rows):
    df = spark.createDataFrame(
        [
            Row(
                event_id=i,
                ts=_BASE + dt.timedelta(seconds=off),
                user_id=uid,
                event_type="view",
                value=float(v),
                props="{}",
            )
            for i, (uid, off, v) in enumerate(rows, start=1)
        ]
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    return str(tmp_path)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_events_strategy)
def test_sessionize_partitions_events_exactly(spark, tmp_path, rows):
    """Sessions partition the event set: per-user session event counts
    sum to that user's event total; session ordinals are dense from 1;
    durations are non-negative and bounded by the user's time span."""
    sf = _write(spark, tmp_path, rows)
    out = product_analytics.q21_sessionize_gap(spark, sf).collect()
    by_user: dict[int, list] = {}
    for r in out:
        by_user.setdefault(r.user_id, []).append(r)
    from collections import Counter

    totals = Counter(uid for uid, _, _ in rows)
    assert set(by_user) == set(totals)
    for uid, sessions in by_user.items():
        assert sum(s.n_events for s in sessions) == totals[uid]
        seqs = sorted(s.session_seq for s in sessions)
        assert seqs == list(range(1, len(sessions) + 1))  # dense ordinals
        span = max(off for u, off, _ in rows if u == uid) - min(
            off for u, off, _ in rows if u == uid
        )
        for s in sessions:
            assert 0 <= s.duration_s <= span


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_events_strategy)
def test_gapfill_grid_conserves_totals(spark, tmp_path, rows):
    """The dense grid conserves mass: n_events sums to the corpus total,
    the grid is exactly |hours| x |types| rows, and zero-filled cells
    carry zero value."""
    sf = _write(spark, tmp_path, rows)
    out = timeseries.q22_timeseries_gapfill(spark, sf).collect()
    assert sum(r.n_events for r in out) == len(rows)
    hours = {r.hour for r in out}
    types = {r.event_type for r in out}
    assert len(out) == len(hours) * len(types)
    assert all(r.value_e2 == 0 for r in out if r.n_events == 0)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_events_strategy)
def test_zscore_scores_every_event_once(spark, tmp_path, rows):
    """One scored row per event; z is NULL exactly when the trailing
    frame lacks variance (singleton or constant frames)."""
    sf = _write(spark, tmp_path, rows)
    out = timeseries.q22_rolling_zscore(spark, sf).collect()
    assert len(out) == len(rows)
    assert len({r.event_id for r in out}) == len(rows)
