"""Round-13 operator tests: the extended x00 sentinel probes.

The round-12 hostile sweeps found two seams that had been invisible for
twelve rounds (session touch-merge, spend-trend anchoring); the round-12
verdict asked for the sentinel to carry both so they stay DRIVER-visible
every round. These tests pin the planted expectations at the value
level — the driver hash then guards them cross-engine.
"""

from __future__ import annotations

from reddit_data_engineering_project_spark import registry

registry.load_all_operators()

_GAP = 1_800_000_000  # 30 minutes in µs (the probe's session gap)


def _audit_rows(spark):
    return registry.QUERIES["x00_adversarial_audit"](
        spark, "/root/testdata/sf0.001"
    ).collect()


def test_x00_session_touch_merge_probe(spark):
    """Planted pairs exactly gap / gap±1µs / 0µs apart: Spark's
    F.session_window MERGES windows that touch (the round-12
    boundary-tie finding, commit 9d0ccc8), so the exactly-gap pair is
    ONE session of 2 spanning 2×gap; only the gap+1µs pair splits."""
    rows = _audit_rows(spark)
    sess = {r.id: r.out for r in rows if r.probe == "sess_touch"}

    # skey = id % 4 picks the class; the first pair of each class
    # starts at id = skey (ids 0..3).
    assert sess[0] == 2 * 10**10 + 2 * _GAP  # touch (== gap): MERGED
    assert sess[1] == 1 * 10**10 + _GAP  # gap + 1µs: split singleton
    assert sess[2] == 2 * 10**10 + 2 * _GAP - 1  # gap - 1µs: merged
    assert sess[3] == 2 * 10**10 + _GAP  # coincident: merged, 0 span
    # 257 planted events (ids 0..256): skey 0 holds 65 rows (32 merged
    # pairs + 1 trailing singleton = 33 sessions), skeys 2/3 hold 64
    # (32 merged pairs each), skey 1 splits its 64 rows into 64
    # singletons — 33 + 64 + 32 + 32 = 161 sessions.
    assert len(sess) == 161
    assert sess[256] == 1 * 10**10 + _GAP  # the skey-0 singleton


def test_x00_spend_trend_anchor_probe(spark):
    """The trend probe anchors day indexes on the earliest DATED
    PURCHASE (planted 3 days after every non-purchase date, so an
    all-events anchor shifts sx) and drops NULL-date purchases (a
    phantom point would inflate n and sy) — the q21_spend_trend_ols
    seam of commit cda0e90, recomputed here from the planting rule."""
    rows = _audit_rows(spark)
    trend = {
        (r.probe, r.id): r.out for r in rows if r.probe.startswith("trend")
    }

    # Replant in Python: ids 0..256, purchases = id % 3 == 0, dated
    # unless bucket (id % 8) == 3; date offset = (id % 16) + 3, amount
    # = (id % 50)*100 + 49 cents; groups g = id % 2.
    dated = [i for i in range(257) if i % 3 == 0 and i % 8 != 3]
    for g in (0, 1):
        ids = [i for i in dated if i % 2 == g]
        anchor = min(i % 16 for i in ids)  # the +3 offset cancels
        assert trend[("trend_n", g)] == len(ids)
        assert trend[("trend_sx", g)] == sum(i % 16 - anchor for i in ids)
        assert trend[("trend_sy", g)] == sum(
            (i % 50) * 100 + 49 for i in ids
        )
    # The NULL-date purchases are all odd ids (3 + 24k), so the g=1
    # count must sit strictly below g=0's — the phantom-point guard.
    assert trend[("trend_n", 1)] < trend[("trend_n", 0)]


# ------------------------------------------- r12 advice: fold inputs


def test_zscore_fold_unquantized_takes_sequential_arm(monkeypatch):
    """Dispatch to the vectorized arm requires the exactness domain
    (integral doubles ≤ _VECTOR_EXACT_MAX), not just batch size: raw
    live doubles could otherwise flip a half-up e4 rounding at an
    association-order boundary between the two arms (r12 advice)."""
    import numpy as np

    from reddit_data_engineering_project_spark.streaming import stateful

    calls = []
    real_seq = stateful._zscore_fold_seq

    def spy(tail, ev, vals):
        calls.append(len(vals))
        return real_seq(tail, ev, vals)

    monkeypatch.setattr(stateful, "_VECTOR_MIN", 0)
    monkeypatch.setattr(stateful, "_zscore_fold_seq", spy)

    ev = np.arange(100, dtype="int64")
    # non-integral raw doubles -> sequential even above the threshold
    stateful._zscore_fold([], ev, np.full(100, 1.25))
    assert calls == [100]
    # integral but out of the exact-sum range -> sequential
    stateful._zscore_fold([], ev, np.full(100, 4.0e7))
    assert calls == [100, 100]
    # a single non-integral TAIL value poisons the batch too
    stateful._zscore_fold([0.5], ev, np.full(100, 3.0))
    assert calls == [100, 100, 100]
    # integral in-range values -> vectorized (spy NOT called)
    stateful._zscore_fold([], ev, np.full(100, 12340000.0))
    assert calls == [100, 100, 100]


def test_zscore_fold_event_ids_exact_and_null_loud():
    """event_id conversion from pandas must be EXACT above 2^53 (no
    float64 round-trip) and a null event_id — the declared primary
    key — must raise, not NaN-cast (r12 advice)."""
    import pandas as pd
    import pytest

    from reddit_data_engineering_project_spark.streaming.stateful import (
        _zscore_fold,
    )

    big = 2**53 + 1  # not representable in float64
    ev, *_ = _zscore_fold(
        [], pd.Series([big, big + 2]), pd.Series([1.0, 2.0])
    )
    assert list(ev) == [big, big + 2]

    with pytest.raises(ValueError, match="primary key"):
        _zscore_fold(
            [],
            pd.Series([1, None], dtype="Int64"),
            pd.Series([1.0, 2.0]),
        )


# ------------------------------------- r12 advice: progress coverage


def test_contract_gate_refuses_full_progress_buffer(spark):
    """raise_on_contract_violations must REFUSE to vouch when the
    progress buffer is at capacity — eviction of early batches'
    observe() metrics (a silent false-pass) can then not be ruled out
    (r12 advice). Below capacity, clean sums pass as before."""
    import pytest

    from reddit_data_engineering_project_spark.session import (
        ensure_session_confs,
    )
    from reddit_data_engineering_project_spark.streaming.runner import (
        raise_on_contract_violations,
    )

    ensure_session_confs(spark)
    cap = int(
        spark.conf.get("spark.sql.streaming.numRecentProgressUpdates")
    )
    assert cap >= 10_000  # session default raised from Spark's 100

    class _Progress:
        observedMetrics = {}

    class _Query:
        def __init__(self, n):
            self.recentProgress = [_Progress()] * n

    # full buffer -> refuse, even with zero observed violations
    with pytest.raises(RuntimeError, match="cannot vouch"):
        raise_on_contract_violations(_Query(cap), "events", spark)
    # below the cap -> clean pass
    raise_on_contract_violations(_Query(cap - 1), "events", spark)
    # no spark handle -> the conservative built-in floor of 100 governs
    with pytest.raises(RuntimeError, match="cannot vouch"):
        raise_on_contract_violations(_Query(100), "events")
