"""Round-12 pins: the ingest contracts are OPERATIONAL (r11 verdict
item 2 — "a guard nobody runs protects nobody").

Three call sites get coverage:

1. ``tools/preflight.py`` stage 3 (``ingest_contracts_check``) — the
   committed corpus passes; a planted out-of-domain corpus raises,
   which is exactly a preflight FAIL;
2. the live ingest runners — the contract rides the existing scan as
   ``observe()`` metrics (zero extra pass) and the run raises after
   completion when any batch carried a violating row;
3. ``tools/check_oracle.py`` — vets whatever corpus it sweeps before
   grading against it (exercised implicitly by every sweep; pinned
   here via the module's in-main call site being reachable with a
   planted dir through ``check_ingest_contracts`` directly).
"""

from __future__ import annotations

import importlib.util
import os
import pathlib

import pytest

from pyspark.sql import functions as F

REPO = pathlib.Path(__file__).resolve().parent.parent

from conftest import SF_DIR


def _load_preflight():
    spec = importlib.util.spec_from_file_location(
        "preflight", REPO / "tools" / "preflight.py"
    )
    pf = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(pf)
    return pf


def _plant_bad_events(spark, sf, out_dir):
    """Copy a corpus dir with one out-of-domain events.value planted."""
    import shutil

    from reddit_data_engineering_project_spark import tables

    os.makedirs(out_dir)
    for t in tables.TABLE_NAMES:
        if t != "events":
            shutil.copy(f"{sf}/{t}.parquet", f"{out_dir}/{t}.parquet")
    ev = spark.read.parquet(f"{sf}/events.parquet")
    ev.withColumn(
        "value",
        F.when(F.col("event_id") == 1, F.lit(1e9)).otherwise(
            F.col("value")
        ),
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{out_dir}/events.parquet"
    )


def test_preflight_ingest_contract_stage(spark, tmp_path):
    """The preflight stage passes on the committed corpus and raises —
    i.e. the stage FAILs — on a planted out-of-domain corpus."""
    pf = _load_preflight()
    detail = pf.ingest_contracts_check(SF_DIR)
    assert detail.startswith("9 tables conform")

    bad = str(tmp_path / "bad")
    _plant_bad_events(spark, SF_DIR, bad)
    with pytest.raises(ValueError, match="in_domain"):
        pf.ingest_contracts_check(bad)
    # and the stage wrapper renders that as a FAIL, not a crash
    name, ok, msg = pf.stage(
        "ingest-contracts", lambda: pf.ingest_contracts_check(bad)
    )
    assert not ok and "ValueError" in msg


def test_tumbling_runner_rejects_out_of_domain_batch(spark, tmp_path):
    """The live ingest gate: a source containing an out-of-domain
    events.value fails the run with a ValueError naming the counts —
    the observe() metrics ride the stream's own scan. contract_table=
    None disables the gate for non-corpus sources."""
    from reddit_data_engineering_project_spark.streaming.runner import (
        run_tumbling_stream,
    )
    from reddit_data_engineering_project_spark.tables import table

    src = os.path.join(str(tmp_path), "src")
    ev = table(spark, SF_DIR, "events")
    ev.withColumn(
        "value",
        F.when(F.col("event_id") == 7, F.lit(-1e9)).otherwise(
            F.col("value")
        ),
    ).coalesce(1).write.parquet(src)

    with pytest.raises(ValueError, match="out-of-domain"):
        run_tumbling_stream(
            spark,
            src,
            os.path.join(str(tmp_path), "sink"),
            os.path.join(str(tmp_path), "ckpt"),
        )
    # gate off: the same source streams through
    run_tumbling_stream(
        spark,
        src,
        os.path.join(str(tmp_path), "sink2"),
        os.path.join(str(tmp_path), "ckpt2"),
        contract_table=None,
    )


def test_enrich_runner_rejects_null_primary_key(spark, tmp_path):
    """Null event_id (the declared NOT-NULL arrival-sequence key) in
    any micro-batch fails the enrich ingest run."""
    from reddit_data_engineering_project_spark.streaming.runner import (
        run_enrich_stream,
    )
    from reddit_data_engineering_project_spark.tables import table

    src = os.path.join(str(tmp_path), "src")
    ev = table(spark, SF_DIR, "events").select(
        "event_id", "ts", "event_type", "value"
    )
    ev.withColumn(
        "event_id",
        F.when(F.col("event_id") == 3, F.lit(None)).otherwise(
            F.col("event_id")
        ),
    ).coalesce(1).write.parquet(src)
    dim = spark.createDataFrame(
        [("view", "engagement")], ["event_type", "category"]
    )
    with pytest.raises(ValueError, match="null-primary-key"):
        run_enrich_stream(
            spark,
            src,
            dim,
            os.path.join(str(tmp_path), "sink"),
            os.path.join(str(tmp_path), "ckpt"),
            on="event_type",
        )


def test_contract_observe_metrics_counts(spark):
    """The observe() aggregate columns count exactly the violating
    rows, batch-side (usable in any DataFrame agg, streaming or not)."""
    from reddit_data_engineering_project_spark.tables import (
        contract_observe_metrics,
    )

    df = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", 1.0),       # clean
            (None, "2024-01-01 00:00:00", 1.0),    # null pk
            (3, "2024-01-01 00:00:00", 2e3),       # value out of domain
            (4, "9999-12-31 23:50:00", 1.0),       # time out of domain
            (5, None, None),                        # nulls stay legal
        ],
        "event_id long, ts string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    row = df.agg(*contract_observe_metrics("events")).first()
    assert (row.n_rows, row.n_null_pk, row.n_out_of_domain) == (5, 1, 2)
    # a table with no declared contract yields no metrics
    assert contract_observe_metrics("lineitem") == []


def test_zscore_fold_paths_identical(monkeypatch):
    """The z-score fold's two arms (sequential small-call loop vs the
    stride-tricks vectorized path, dispatched on _VECTOR_MIN) must be
    ROW-IDENTICAL — outputs, masks, and state tail (None≡NaN) — since
    which arm runs depends only on batch size, never on data. Covers
    NaN values, a state tail carrying None (the array<double> round
    trip can render missing as None), and both sides of the dispatch
    threshold."""
    import numpy as np

    from reddit_data_engineering_project_spark.streaming import stateful

    rng = np.random.default_rng(42)

    def both(tail, ev, vals):
        outs = []
        for forced in (0, 10**9):  # 0 -> always vectorized, huge -> seq
            monkeypatch.setattr(stateful, "_VECTOR_MIN", forced)
            outs.append(stateful._zscore_fold(list(tail), ev, vals))
        return outs

    for m in (1, 7, 63, 64, 65, 500):
        ev = rng.integers(1, 10**9, m).astype("int64")
        # Integral e4-style doubles: the vectorized arm's exactness
        # domain (round 13 it DISPATCHES on that domain — non-integral
        # inputs take the sequential arm on both sides, which would
        # make this identity check vacuous).
        vals = np.where(
            rng.random(m) < 0.15,
            np.nan,
            np.round(rng.normal(0.0, 100.0, m) * 10000.0),
        )
        for tail in ([], [10000.0, None, float("nan"), -25000.0]):
            (e1, v1, vm1, z1, zm1, t1), (e2, v2, vm2, z2, zm2, t2) = both(
                tail, ev, vals
            )
            assert list(e1) == list(e2)
            assert list(vm1) == list(vm2) and list(zm1) == list(zm2)
            assert list(v1[~vm1]) == list(v2[~vm2])
            assert list(z1[~zm1]) == list(z2[~zm2])
            assert len(t1) == len(t2) <= stateful._FRAME - 1
            for a, b in zip(t1, t2):
                a_missing = a is None or a != a
                b_missing = b is None or b != b
                assert a_missing == b_missing
                if not a_missing:
                    assert a == b


def test_stateful_zscore_runner_rejects_out_of_domain(spark, tmp_path):
    """The stateful runners (stateful.py) carry the same observe()-based
    ingest gate as the runner.py ingest paths: an out-of-domain
    events.value fails the run after completion."""
    from reddit_data_engineering_project_spark.streaming.stateful import (
        run_zscore_stream,
    )
    from reddit_data_engineering_project_spark.tables import table

    src = os.path.join(str(tmp_path), "src")
    ev = table(spark, SF_DIR, "events")
    ev.withColumn(
        "value",
        F.when(F.col("event_id") == 5, F.lit(7e7)).otherwise(
            F.col("value")
        ),
    ).coalesce(1).write.parquet(src)
    with pytest.raises(ValueError, match="out-of-domain"):
        run_zscore_stream(
            spark,
            src,
            os.path.join(str(tmp_path), "sink"),
            os.path.join(str(tmp_path), "ckpt"),
        )


def test_finite_embedding_contract(spark, tmp_path):
    """tables.FINITE_ARRAYS: embedding components must be finite and
    element-non-null (a NaN poisons every x03 distance on BOTH engines
    and then sorts by each engine's own NaN rule — an ingest bug, not a
    data condition). Committed corpus conforms; planted NaN / Inf /
    null-element corpora raise; a NULL embedding ROW stays legal."""
    from reddit_data_engineering_project_spark import tables

    sf = SF_DIR
    tables.check_ingest_contracts(spark, sf, tables=("embeddings",))

    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    cases = {
        "nan": F.expr(
            "transform(embedding, (x, i) -> "
            "CASE WHEN i = 0 THEN float('NaN') ELSE x END)"
        ),
        "inf": F.expr(
            "transform(embedding, (x, i) -> "
            "CASE WHEN i = 1 THEN float('Infinity') ELSE x END)"
        ),
        "null_elem": F.expr(
            "transform(embedding, (x, i) -> "
            "CASE WHEN i = 2 THEN CAST(NULL AS FLOAT) ELSE x END)"
        ),
    }
    for tag, expr in cases.items():
        bad = str(tmp_path / tag)
        os.makedirs(bad)
        emb.withColumn(
            "embedding",
            F.when(F.col("vec_id") == 0, expr).otherwise(
                F.col("embedding")
            ),
        ).coalesce(1).write.parquet(f"{bad}/embeddings.parquet")
        with pytest.raises(ValueError, match="in_domain"):
            tables.check_ingest_contracts(
                spark, bad, tables=("embeddings",)
            )
    # NULL row: legal (a document not yet embedded)
    ok = str(tmp_path / "null_row")
    os.makedirs(ok)
    emb.withColumn(
        "embedding",
        F.when(F.col("vec_id") == 0, F.lit(None)).otherwise(
            F.col("embedding")
        ),
    ).coalesce(1).write.parquet(f"{ok}/embeddings.parquet")
    tables.check_ingest_contracts(spark, ok, tables=("embeddings",))
