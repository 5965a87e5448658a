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
