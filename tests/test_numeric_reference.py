"""Independent numeric references for the math-heavy operators.

The DuckDB oracle proves CROSS-ENGINE agreement; these tests prove the
MATH, by re-deriving each result with numpy/pandas from the raw parquet
— a third implementation sharing no code or SQL with either engine.

Determinism discipline mirrors the operators: integer cents, exact
moments, sequential float64 accumulation where the op is sequential.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from reddit_data_engineering_project_spark import registry

from conftest import SF_DIR

registry.load_all_operators()


def _round_half_away(x: float) -> int:
    """Spark/DuckDB ``round`` semantics (HALF_UP, away from zero) —
    Python's ``round`` is banker's and disagrees on exact .5 ties."""
    return int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))


def _events_pdf() -> pd.DataFrame:
    pdf = pq.read_table(f"{SF_DIR}/events.parquet").to_pandas()
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    return pdf


def test_ols_slope_matches_numpy_lstsq(spark):
    """q21_spend_trend_ols == numpy least-squares, per user."""
    out = {
        r["user_id"]: r
        for r in registry.QUERIES["q21_spend_trend_ols"](spark, SF_DIR)
        .collect()
    }
    pdf = _events_pdf()
    p = pdf[pdf.event_type == "purchase"].copy()
    p["cents"] = p["value"].mul(100.0).round().astype("int64")
    p["day"] = p["ts"].dt.floor("D")
    d0 = pdf[pdf.event_type == "purchase"]["ts"].dt.floor("D").min()
    daily = (
        p.groupby(["user_id", "day"], as_index=False)["cents"].sum()
    )
    daily["x"] = (daily["day"] - d0).dt.days
    n_checked = 0
    for uid, g in daily.groupby("user_id"):
        if len(g) < 2:
            assert uid not in out
            continue
        slope = np.polyfit(
            g["x"].to_numpy(float), g["cents"].to_numpy(float), 1
        )[0]
        row = out[uid]
        assert row["n_days"] == len(g)
        assert row["total_cents"] == int(g["cents"].sum())
        # engine emits round(slope * 1e4); polyfit solves by SVD, so
        # allow one e4 unit of last-ulp divergence at the boundary.
        assert abs(row["slope_e4"] - slope * 10000.0) <= 1.0, uid
        n_checked += 1
    assert n_checked == len(out) > 0


def test_kmeans_step_matches_numpy_reference(spark):
    """x03_kmeans_step == an argmin/mean re-derivation from the parquet.

    Distances use the SAME expanded form v·v − 2 v·c + c·c with
    strictly sequential float64 dot products (the operators' pinned
    summation order), so the assignment comparison is exact, no
    tolerance.
    """
    out = {
        (r["cluster_id"], r["dim"]): r
        for r in registry.QUERIES["x03_kmeans_step"](spark, SF_DIR).collect()
    }
    emb = pq.read_table(f"{SF_DIR}/embeddings.parquet").to_pandas()
    vecs = {
        int(r.vec_id): np.asarray(r.embedding, dtype=np.float64)
        for r in emb.itertuples()
    }
    cents = {cid: vecs[cid] for cid in sorted(vecs) if cid < 8}

    def seq_dot(a: np.ndarray, b: np.ndarray) -> float:
        acc = 0.0
        for x, y in zip(a.tolist(), b.tolist()):
            acc += x * y
        return acc

    members: dict[int, list[int]] = {cid: [] for cid in cents}
    for vid, v in vecs.items():
        vv = seq_dot(v, v)
        best = min(
            (vv - 2.0 * seq_dot(v, c) + seq_dot(c, c), cid)
            for cid, c in cents.items()
        )
        members[best[1]].append(vid)

    for cid, vids in members.items():
        scaled = np.stack([vecs[v] for v in vids]) * 1_000_000.0
        q = np.array(
            [[_round_half_away(x) for x in row_] for row_ in scaled],
            dtype="int64",
        )
        sums = q.sum(axis=0)
        for dim in range(64):
            row = out[(cid, dim)]
            assert row["n_members"] == len(vids)
            assert row["mean_e6"] == _round_half_away(sums[dim] / len(vids))
    assert len(out) == 8 * 64


def test_ewma_matches_pandas_reference(spark):
    """q22_ewma_window == a pandas re-derivation with explicit weights."""
    out = {
        r["event_id"]: r["ewma_cents_e2"]
        for r in registry.QUERIES["q22_ewma_window"](spark, SF_DIR).collect()
    }
    pdf = _events_pdf()
    p = pdf[pdf.event_type == "purchase"].copy()
    p["cents"] = p["value"].mul(100.0).round().astype("int64")
    p = p.sort_values(["user_id", "ts", "event_id"])
    weights = (8, 4, 2, 1)
    n_checked = 0
    for _, g in p.groupby("user_id"):
        cents = g["cents"].tolist()
        ids = g["event_id"].tolist()
        for i, eid in enumerate(ids):
            num = den = 0
            for k, w in enumerate(weights):
                if i - k >= 0:
                    num += w * cents[i - k]
                    den += w
            expect = _round_half_away(num * 100.0 / den)
            assert out[eid] == expect, eid
            n_checked += 1
    assert n_checked == len(out) > 0


def test_readability_monotone_sanity(spark):
    """x04_readability: structural invariants a formula bug would break.

    (Value-exactness is the oracle's job; this pins the semantics:
    syllable and sentence counts can never exceed char counts, and the
    Flesch identity reconstructs from the emitted integer counts.)
    """
    rows = registry.QUERIES["x04_readability"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 1 <= r["n_sentences"]
        assert 1 <= r["n_syllables"]
        expect = _round_half_away(
            (
                206.835
                - 1.015 * (r["n_words"] / r["n_sentences"])
                - 84.6 * (r["n_syllables"] / r["n_words"])
            )
            * 100.0
        )
        assert r["flesch_e2"] == expect


def test_cusum_matches_textbook_recurrence(spark):
    """q22_cusum_drift's prefix closed form == the textbook recurrence
    C_t = max(0, C_{t-1} + dev_t), replayed per user in Python."""
    from reddit_data_engineering_project_spark.operators.timeseries import (
        _CUSUM_TARGET_CENTS,
    )

    out = {
        r["event_id"]: (r["cum_dev"], r["cusum_pos"])
        for r in registry.QUERIES["q22_cusum_drift"](spark, SF_DIR).collect()
    }
    pdf = _events_pdf()
    p = pdf[pdf.event_type == "purchase"].copy()
    p["dev"] = (
        p["value"].mul(100.0).round().astype("int64") - _CUSUM_TARGET_CENTS
    )
    p = p.sort_values(["user_id", "ts", "event_id"])
    n_checked = 0
    for _, g in p.groupby("user_id"):
        c = 0
        s = 0
        for eid, dev in zip(g["event_id"], g["dev"]):
            c = max(0, c + dev)
            s += dev
            assert out[eid] == (s, c), eid
            n_checked += 1
    assert n_checked == len(out) > 0
