"""Custom stateful operator live: state persists across availableNow runs
and the final per-user profile equals the batch aggregate."""

from __future__ import annotations

import os

from pyspark.sql import Window, functions as F

from reddit_data_engineering_project_spark.streaming.stateful import (
    run_profile_stream,
)
from reddit_data_engineering_project_spark.tables import table

from conftest import SF_DIR


def test_state_accumulates_across_runs(spark, tmp_path):
    src = os.path.join(str(tmp_path), "src")
    sink = os.path.join(str(tmp_path), "sink")
    ckpt = os.path.join(str(tmp_path), "ckpt")

    ev = table(spark, SF_DIR, "events").select(
        "event_id",
        "ts",
        "user_id",
        F.coalesce(F.col("value"), F.lit(0.0)).alias("value"),
    )
    half1 = ev.filter(F.col("event_id") % 2 == 0)
    half2 = ev.filter(F.col("event_id") % 2 == 1)

    # Run 1: first half of the stream arrives.
    half1.coalesce(1).write.mode("append").parquet(src)
    run_profile_stream(spark, src, sink, ckpt)
    # Run 2: more files land; checkpointed restart folds them into state.
    half2.coalesce(1).write.mode("append").parquet(src)
    run_profile_stream(spark, src, sink, ckpt)

    out = spark.read.option("recursiveFileLookup", True).parquet(sink)
    # Latest emitted profile per user (update mode emits one per batch).
    w = Window.partitionBy("user_id").orderBy(
        F.col("n_events").desc(), F.col("last_ts").desc()
    )
    final = (
        out.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "n_events", "total_value", "last_ts")
    )
    expected = ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.sum("value").alias("total_value"),
        F.max("ts").alias("last_ts"),
    )
    joined = final.alias("f").join(expected.alias("e"), "user_id")
    mismatches = joined.filter(
        (F.col("f.n_events") != F.col("e.n_events"))
        | (F.abs(F.col("f.total_value") - F.col("e.total_value")) > 1e-6)
        | (F.col("f.last_ts") != F.col("e.last_ts"))
    )
    assert final.count() == expected.count()
    assert mismatches.count() == 0


def test_streaming_zscore_matches_batch_on_ordered_arrival(spark, tmp_path):
    """Two availableNow runs over time-split files: every event scored
    exactly once, and the streaming score equals the batch
    q22_rolling_zscore (±1 e4 unit for float-accumulation order)."""
    import pandas as pd

    from reddit_data_engineering_project_spark.operators.timeseries import (
        q22_rolling_zscore,
    )
    from reddit_data_engineering_project_spark.streaming.stateful import (
        run_zscore_stream,
    )

    src = os.path.join(str(tmp_path), "zsrc")
    sink = os.path.join(str(tmp_path), "zsink")
    ckpt = os.path.join(str(tmp_path), "zckpt")

    ev = table(spark, SF_DIR, "events").select(
        "event_id", "ts", "user_id", "value"
    )
    cutoff = ev.agg(
        F.expr("percentile_approx(CAST(ts AS DOUBLE), 0.5)")
    ).first()[0]
    early = ev.filter(F.col("ts").cast("double") <= cutoff)
    late = ev.filter(F.col("ts").cast("double") > cutoff)

    # Time-ordered arrival: run 1 sees the early half, run 2 the rest.
    early.coalesce(1).write.mode("append").parquet(src)
    run_zscore_stream(spark, src, sink, ckpt)
    late.coalesce(1).write.mode("append").parquet(src)
    run_zscore_stream(spark, src, sink, ckpt)

    streamed = (
        spark.read.option("recursiveFileLookup", True)
        .parquet(sink)
        .toPandas()
        .set_index("event_id")
        .sort_index()
    )
    batch = (
        q22_rolling_zscore(spark, SF_DIR)
        .toPandas()
        .set_index("event_id")
        .sort_index()
    )
    # exactly-once: one scored row per event
    assert len(streamed) == len(batch)
    assert not streamed.index.duplicated().any()
    assert (streamed["value_e4"].dropna() == batch["value_e4"].dropna()).all()
    sz = streamed["z_e4"].astype("Float64")
    bz = batch["z_e4"].astype("Float64")
    assert (sz.isna() == bz.isna()).all()
    diff = (sz - bz).abs().dropna()
    assert (diff <= 1).all(), diff[diff > 1].head()


def test_streaming_zscore_null_values_occupy_frame_slots(spark, tmp_path):
    """A NULL-value event consumes a frame slot (aging out older values)
    but contributes nothing to the stats — the batch ROWS-frame
    semantics. Streamed output must equal batch on a NULL-bearing key."""
    from pyspark.sql import Row

    from reddit_data_engineering_project_spark.operators.timeseries import (
        q22_rolling_zscore,
    )
    from reddit_data_engineering_project_spark.streaming.stateful import (
        run_zscore_stream,
    )

    rows = [
        Row(event_id=i, ts=f"2024-01-01 00:00:{i:02d}", user_id=1,
            value=(None if i == 8 else float(v)), props="{}")
        for i, v in zip(range(1, 10), [1, 2, 3, 4, 5, 6, 7, 0, 100])
    ]
    src = os.path.join(str(tmp_path), "nsrc")
    sink = os.path.join(str(tmp_path), "nsink")
    ckpt = os.path.join(str(tmp_path), "nckpt")
    sf = str(tmp_path)
    df = spark.createDataFrame(rows).withColumn("ts", F.to_timestamp("ts"))
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(sf, "events.parquet")
    )
    df.select("event_id", "ts", "user_id", "value").coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)

    run_zscore_stream(spark, src, sink, ckpt)
    streamed = {
        r.event_id: (r.value_e4, r.z_e4)
        for r in spark.read.option("recursiveFileLookup", True)
        .parquet(sink)
        .collect()
    }
    batch = {
        r.event_id: (r.value_e4, r.z_e4)
        for r in q22_rolling_zscore(spark, sf).collect()
    }
    assert streamed == batch
    assert streamed[8] == (None, None)  # the NULL row itself unscored


def test_event_time_timeout_closes_idle_sessions(spark, tmp_path):
    """EventTimeTimeout mechanism live: a user's burst separated by more
    than the gap splits into a gap-closed session; a user who goes
    silent while OTHERS keep the watermark advancing gets their last
    session closed by TIMEOUT — the emission no gap-split could ever
    produce. Three availableNow runs over time-ordered file drops keep
    the watermark (0 s delay) marching deterministically."""
    import pandas as pd

    from reddit_data_engineering_project_spark.streaming.stateful import (
        run_session_stream,
    )

    src = os.path.join(str(tmp_path), "src")
    sink = os.path.join(str(tmp_path), "sink")
    ckpt = os.path.join(str(tmp_path), "ckpt")

    def drop(rows):
        # rows: (event_id, iso_ts, user_id)
        import datetime

        pdf = spark.createDataFrame(
            [
                (
                    e,
                    datetime.datetime.fromisoformat(t),
                    u,
                    "view",
                    1.0,
                )
                for e, t, u in rows
            ],
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double",
        )
        pdf.coalesce(1).write.mode("append").parquet(src)

    # File 1: user 1 burst A (2 events); user 2 active.
    drop(
        [
            (1, "2024-01-01 00:00:00", 1),
            (2, "2024-01-01 00:10:00", 1),
            (3, "2024-01-01 00:05:00", 2),
        ]
    )
    run_session_stream(spark, src, sink, ckpt)
    # File 2: user 1 returns AFTER the 30-min gap (splits burst A off);
    # user 2 still active.
    drop(
        [
            (4, "2024-01-01 02:00:00", 1),
            (5, "2024-01-01 02:00:00", 2),
        ]
    )
    run_session_stream(spark, src, sink, ckpt)
    # File 3: ONLY user 2, far in the future — the watermark passes
    # user 1's (last + gap) instant, firing their timeout.
    drop([(6, "2024-01-01 06:00:00", 2)])
    run_session_stream(spark, src, sink, ckpt)

    out = (
        spark.read.option("recursiveFileLookup", True)
        .parquet(sink)
        .collect()
    )
    by_user = {}
    for r in out:
        by_user.setdefault(r.user_id, []).append(r)

    u1 = sorted(by_user[1], key=lambda r: r.session_start)
    # Burst A closed by the in-data gap when event 4 arrived.
    assert (
        u1[0].n_events == 2
        and u1[0].closed_by == "gap"
        and u1[0].session_start == pd.Timestamp("2024-01-01 00:00:00")
        and u1[0].session_end == pd.Timestamp("2024-01-01 00:10:00")
    )
    # The 02:00 singleton closed by WATERMARK TIMEOUT (no later event
    # of user 1 exists to gap-split it).
    assert (
        u1[1].n_events == 1
        and u1[1].closed_by == "timeout"
        and u1[1].session_start == pd.Timestamp("2024-01-01 02:00:00")
    )
    # User 2's gap-closed earlier sessions emitted; their final (06:00)
    # session is still OPEN in state — append mode must NOT have
    # emitted it.
    ends = {r.session_end for r in by_user[2]}
    assert pd.Timestamp("2024-01-01 06:00:00") not in ends


def test_session_stream_ignores_nat_event_times():
    """Live-path semantics pin (r09 advice): NaT event times are DROPPED
    by close_idle_sessions — they neither split a session (the pre-r09
    fold coerced NaT to int64-min, force-splitting), nor count toward
    n_events, nor move session bounds. Matches the s09 oracle's
    ``ts IS NOT NULL`` filter."""
    import pandas as pd

    from reddit_data_engineering_project_spark.streaming.stateful import (
        NAT_US,
        close_idle_sessions,
    )
    from reddit_data_engineering_project_spark.streaming.stream_queries import (
        _ReplayGroupState,
    )

    def fold(ts_list):
        pdf = pd.DataFrame(
            {
                "user_id": [1] * len(ts_list),
                "event_id": range(1, len(ts_list) + 1),
                "ts_us": [
                    NAT_US
                    if t is None
                    else int(pd.Timestamp(t).value // 1000)
                    for t in ts_list
                ],
            }
        )
        state = _ReplayGroupState()
        out = list(close_idle_sessions((1,), iter([pdf]), state))
        return out, state

    base = ["2024-01-01 00:00:00", "2024-01-01 00:10:00",
            "2024-01-01 02:00:00"]
    with_nat = base[:2] + [None, None] + base[2:]

    out_a, st_a = fold(base)
    out_b, st_b = fold(with_nat)
    # identical emissions (one gap-closed 2-event session)...
    a = pd.concat(out_a, ignore_index=True)
    b = pd.concat(out_b, ignore_index=True)
    pd.testing.assert_frame_equal(a, b)
    assert list(a["n_events"]) == [2] and list(a["closed_by"]) == ["gap"]
    # ...and identical open-session state + timeout instant
    assert st_a.get == st_b.get and st_a.timeout_ts == st_b.timeout_ts

    # an ALL-NaT batch with no prior state tracks nothing at all
    out_c, st_c = fold([None, None])
    assert out_c == [] and not st_c.exists and st_c.timeout_ts is None


def test_session_stream_null_ts_does_not_advance_watermark(spark, tmp_path):
    """NULL event times must not move the live watermark (r16 advice,
    high): ``least()`` SKIPS nulls, so the pre-r17 clamp turned a NULL
    ts into the 2262 ceiling — one NULL row advanced the watermark to
    the ns ceiling, timeout-closing every open session and dropping all
    subsequent in-range rows as late. On the raw-ts watermark NULL never
    advanced it; the clamped column must preserve that. Scenario: a
    NULL-ts row lands beside an open session, then an IN-GAP event
    follows — it must merge (n=2), not be late-dropped."""
    import datetime

    from reddit_data_engineering_project_spark.streaming.stateful import (
        run_session_stream,
        run_session_stream_bucketed,
    )

    def drop(src, rows):
        pdf = spark.createDataFrame(
            [
                (
                    e,
                    None if t is None else datetime.datetime.fromisoformat(t),
                    u,
                    "view",
                    1.0,
                )
                for e, t, u in rows
            ],
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double",
        )
        pdf.coalesce(1).write.mode("append").parquet(src)

    # F1: user 1 opens a session; user 2 contributes a NULL-ts row.
    # F2: user 1 returns WITHIN the gap — must merge into the open
    #     session (the poisoned watermark would have dropped it late).
    # F3: user 2 far in the future fires user 1's timeout.
    files = [
        [(1, "2024-01-01 00:00:00", 1), (2, None, 2)],
        [(3, "2024-01-01 00:10:00", 1)],
        [(4, "2024-01-01 06:00:00", 2)],
    ]
    import pandas as pd

    for tag, runner, kwargs in (
        ("per_user", run_session_stream, {}),
        ("bucketed", run_session_stream_bucketed, {"n_buckets": 1}),
    ):
        src = os.path.join(str(tmp_path), f"src_{tag}")
        sink = os.path.join(str(tmp_path), f"sink_{tag}")
        ckpt = os.path.join(str(tmp_path), f"ckpt_{tag}")
        for rows in files:
            drop(src, rows)
            runner(spark, src, sink, ckpt, **kwargs)
        out = (
            spark.read.option("recursiveFileLookup", True)
            .parquet(sink)
            .collect()
        )
        got = sorted(
            (r.user_id, r.session_start, r.session_end, r.n_events,
             r.closed_by)
            for r in out
        )
        # exactly user 1's merged 2-event session, timeout-closed; the
        # NULL-ts row tracked nothing and user 2's 06:00 stays open
        assert got == [
            (
                1,
                pd.Timestamp("2024-01-01 00:00:00"),
                pd.Timestamp("2024-01-01 00:10:00"),
                2,
                "timeout",
            )
        ], (tag, got)


def test_wm_saturation_counter_fires_past_ns_ceiling(spark, tmp_path):
    """Watermark saturation is OBSERVABLE (r16 verdict item 4): past
    2262-04-11 the clamped watermark saturates — documented degradation
    (timeout-closure stops firing) that was previously silent. The
    observe() counter rides the contract-gate scan and the runners warn
    post-run; it must FIRE on a past-ceiling corpus (contract-legal:
    TIME_DOMAIN reaches 2999-12-31) and stay SILENT on committed-shaped
    fixtures."""
    import datetime
    import warnings

    from reddit_data_engineering_project_spark.streaming.stateful import (
        run_session_stream,
        run_session_stream_bucketed,
    )

    def drop(src, rows):
        pdf = spark.createDataFrame(
            [
                (e, datetime.datetime.fromisoformat(t), u, "view", 1.0)
                for e, t, u in rows
            ],
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double",
        )
        pdf.coalesce(1).write.mode("append").parquet(src)

    in_range = [
        (1, "2024-01-01 00:00:00", 1),
        (2, "2024-01-01 00:10:00", 1),
    ]
    past_ceiling = [
        (3, "2500-01-01 00:00:00", 1),  # beyond 2262-04-11, inside domain
        (4, "2024-01-02 00:00:00", 2),
    ]
    for tag, runner, kwargs in (
        ("per_user", run_session_stream, {}),
        ("bucketed", run_session_stream_bucketed, {"n_buckets": 1}),
    ):
        src = os.path.join(str(tmp_path), f"src_{tag}")
        sink = os.path.join(str(tmp_path), f"sink_{tag}")
        ckpt = os.path.join(str(tmp_path), f"ckpt_{tag}")
        # committed-shaped fixture: counter stays zero, no warning
        drop(src, in_range)
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            runner(spark, src, sink, ckpt, **kwargs)
        assert not [
            w for w in caught if "ns" in str(w.message) and "ceiling"
            in str(w.message)
        ], tag
        # one past-ceiling event: the counter fires with its count
        drop(src, past_ceiling)
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            runner(spark, src, sink, ckpt, **kwargs)
        hits = [
            w for w in caught
            if issubclass(w.category, RuntimeWarning)
            and "ceiling" in str(w.message)
        ]
        assert len(hits) == 1, (tag, [str(w.message) for w in caught])
        assert "1 event(s)" in str(hits[0].message), str(hits[0].message)


def test_zscore_fold_sorts_huge_extension_ids_exactly():
    """Tie-break exactness (r16 advice): the pre-r17 nullable/object
    fallback cast event_id to float64 for the lexsort key; float64
    spacing at 2^57 is 32, so ts-tied rows with nearby huge ids
    collided and kept ARRIVAL order instead of id order, silently
    changing fold row identity. Both fold paths must sort ts-tied
    extension-dtype ids in exact integer order."""
    import numpy as np
    import pandas as pd

    from reddit_data_engineering_project_spark.streaming.stateful import (
        score_rolling_zscore,
        score_rolling_zscore_bucketed,
    )
    from reddit_data_engineering_project_spark.streaming.stream_queries import (
        _ReplayGroupState,
    )

    base = 1 << 57
    ts = int(pd.Timestamp("2024-01-01").value // 1000)
    # float64 cannot even represent the distinction the sort relies on
    assert float(base + 3) == float(base + 1)

    for eid_col in (
        pd.array([base + 3, base + 1], dtype="Int64"),  # extension
        np.array([base + 3, base + 1], dtype=object),  # object fallback
    ):
        pdf = pd.DataFrame(
            {
                "user_id": pd.array([1, 1], dtype="Int64"),
                "event_id": eid_col,
                "ts_us": np.array([ts, ts], dtype="int64"),
                "value": [10.0, 20.0],
            }
        )
        for fn, key in (
            (score_rolling_zscore, (1,)),
            (score_rolling_zscore_bucketed, (0,)),
        ):
            out = pd.concat(
                list(fn(key, iter([pdf.copy()]), _ReplayGroupState())),
                ignore_index=True,
            )
            # exact id order: base+1 (value 20.0) folds FIRST
            assert list(out["event_id"]) == [base + 1, base + 3], fn.__name__
            assert list(out["value_e4"]) == [200000, 100000], fn.__name__


def test_bucketed_zscore_rejects_null_extension_event_id():
    """A null id in a nullable-extension event_id column must fail
    loudly on the bucketed path (event_id is the declared primary key)
    — the pre-r17 float64 cast would have folded it as NaN, and the
    exact int64 view must not silently fold it as a filled zero."""
    import numpy as np
    import pandas as pd
    import pytest as _pytest

    from reddit_data_engineering_project_spark.streaming.stateful import (
        score_rolling_zscore_bucketed,
    )
    from reddit_data_engineering_project_spark.streaming.stream_queries import (
        _ReplayGroupState,
    )

    ts = int(pd.Timestamp("2024-01-01").value // 1000)
    pdf = pd.DataFrame(
        {
            "user_id": pd.array([1, 1], dtype="Int64"),
            "event_id": pd.array([1, None], dtype="Int64"),
            "ts_us": np.array([ts, ts], dtype="int64"),
            "value": [10.0, 20.0],
        }
    )
    with _pytest.raises(ValueError, match="primary key"):
        list(
            score_rolling_zscore_bucketed(
                (0,), iter([pdf]), _ReplayGroupState()
            )
        )


def test_bucketed_session_stream_matches_per_user(spark, tmp_path):
    """The key-coarsened sessionizer (r10 verdict item 3: per-key
    protocol cost amortized over user buckets) must be ROW-IDENTICAL to
    the per-user operator the s09 replays verify — same sessions, same
    closed_by labels — on a real multi-batch corpus including the NULL
    user. n_buckets=4 forces many users per bucket."""
    from reddit_data_engineering_project_spark.streaming.stateful import (
        run_session_stream,
        run_session_stream_bucketed,
    )

    ev = table(spark, SF_DIR, "events")
    src = os.path.join(str(tmp_path), "src")
    slice_col = F.ntile(3).over(
        Window.orderBy(F.col("ts").asc_nulls_first(), "event_id")
    )
    staged = ev.withColumn("slice", slice_col).persist()
    staged.count()
    for i in range(1, 4):
        staged.filter(F.col("slice") == i).drop("slice").coalesce(
            1
        ).write.mode("append").parquet(src)
    staged.unpersist()

    outs = {}
    for tag, runner, kwargs in (
        ("per_user", run_session_stream, {}),
        ("bucketed", run_session_stream_bucketed, {"n_buckets": 4}),
    ):
        sink = os.path.join(str(tmp_path), f"sink_{tag}")
        ckpt = os.path.join(str(tmp_path), f"ckpt_{tag}")
        runner(spark, src, sink, ckpt, **kwargs)
        rows = (
            spark.read.option("recursiveFileLookup", True)
            .parquet(sink)
            .collect()
        )
        outs[tag] = sorted(
            (r.user_id, r.session_start, r.session_end, r.n_events,
             r.closed_by)
            for r in rows
        )
    assert outs["per_user"] == outs["bucketed"]
    assert len(outs["per_user"]) > 0


def test_bucketed_session_single_bucket_timeout_and_gap(spark, tmp_path):
    """All users in ONE bucket: a user who goes idle must still close by
    TIMEOUT in the same micro-batch as per-user keying would fire it —
    including when the bucket HAS data for other users (the selective
    no-data-user expiry inside a data invocation) — and gap splits stay
    gap splits."""
    import datetime

    import pandas as pd

    from reddit_data_engineering_project_spark.streaming.stateful import (
        run_session_stream_bucketed,
    )

    src = os.path.join(str(tmp_path), "src")
    sink = os.path.join(str(tmp_path), "sink")
    ckpt = os.path.join(str(tmp_path), "ckpt")

    def drop(rows):
        pdf = spark.createDataFrame(
            [
                (e, datetime.datetime.fromisoformat(t), u, "view", 1.0)
                for e, t, u in rows
            ],
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double",
        )
        pdf.coalesce(1).write.mode("append").parquet(src)

    run = lambda: run_session_stream_bucketed(  # noqa: E731
        spark, src, sink, ckpt, n_buckets=1
    )
    # File 1: user 1 burst; user 2 active.
    drop(
        [
            (1, "2024-01-01 00:00:00", 1),
            (2, "2024-01-01 00:10:00", 1),
            (3, "2024-01-01 00:05:00", 2),
        ]
    )
    run()
    # File 2: user 1 returns after the gap (splits the burst); user 2
    # continues a separate chain.
    drop(
        [
            (4, "2024-01-01 02:00:00", 1),
            (5, "2024-01-01 02:00:00", 2),
        ]
    )
    run()
    # File 3: ONLY user 2 — the shared bucket gets a DATA invocation,
    # within which user 1's expired deadline must close by timeout.
    drop([(6, "2024-01-01 06:00:00", 2)])
    run()

    out = (
        spark.read.option("recursiveFileLookup", True)
        .parquet(sink)
        .collect()
    )
    by_user = {}
    for r in out:
        by_user.setdefault(r.user_id, []).append(r)
    u1 = sorted(by_user[1], key=lambda r: r.session_start)
    assert [(r.n_events, r.closed_by) for r in u1] == [
        (2, "gap"),
        (1, "timeout"),
    ]
    assert u1[0].session_end == pd.Timestamp("2024-01-01 00:10:00")
    assert u1[1].session_start == pd.Timestamp("2024-01-01 02:00:00")
    # user 2's earlier singletons gap/timeout-closed; final session open
    u2 = sorted(by_user[2], key=lambda r: r.session_start)
    assert all(r.n_events == 1 for r in u2)
    assert len(u2) == 2


def test_bucketed_zscore_stream_matches_per_user(spark, tmp_path):
    """Key-coarsened z-score gate: row-identical to the per-user
    operator the s08 replay verifies — same scores, same NULL-value
    rows, incl. the NULL user — on a 3-batch time-ordered corpus.

    The corpus is salted with NULL-ts rows (legal per TIME_DOMAINS):
    the z-score fold KEEPS them — they occupy a frame slot — so their
    position in the fold order is load-bearing, and the bucketed path
    must place NaT LAST like the per-user sort_values does (r11
    advice: the raw-int64 lexsort put NaT FIRST and diverged)."""
    from reddit_data_engineering_project_spark.streaming.stateful import (
        run_zscore_stream,
        run_zscore_stream_bucketed,
    )

    ev = table(spark, SF_DIR, "events")
    null_ts = (
        ev.orderBy("event_id")
        .limit(5)
        .withColumn("ts", F.lit(None).cast("timestamp"))
        .withColumn("event_id", F.col("event_id") + F.lit(10**9))
    )
    ev = ev.unionByName(null_ts)
    src = os.path.join(str(tmp_path), "src")
    slice_col = F.ntile(3).over(
        Window.orderBy(F.col("ts").asc_nulls_first(), "event_id")
    )
    staged = ev.withColumn("slice", slice_col).persist()
    staged.count()
    for i in range(1, 4):
        staged.filter(F.col("slice") == i).drop("slice").coalesce(
            1
        ).write.mode("append").parquet(src)
    staged.unpersist()

    outs = {}
    for tag, runner, kwargs in (
        ("per_user", run_zscore_stream, {}),
        ("bucketed", run_zscore_stream_bucketed, {"n_buckets": 4}),
    ):
        sink = os.path.join(str(tmp_path), f"sink_{tag}")
        ckpt = os.path.join(str(tmp_path), f"ckpt_{tag}")
        runner(spark, src, sink, ckpt, **kwargs)
        rows = (
            spark.read.option("recursiveFileLookup", True)
            .parquet(sink)
            .collect()
        )
        outs[tag] = sorted(
            (r.user_id, r.event_id, r.value_e4, r.z_e4) for r in rows
        )
    assert outs["per_user"] == outs["bucketed"]
    assert len(outs["per_user"]) > 0


def test_session_streams_filter_late_rows_identically(spark, tmp_path):
    """What late arrivals ACTUALLY do on the live path (r11 advice
    follow-up): with EventTimeTimeout, Spark drops input rows older
    than the watermark BEFORE the stateful function — in BOTH runners —
    so a late event can never extend a behind-deadline session through
    these streams at all. (And an accepted row is >= wm, hence out of
    gap of any behind-deadline session: it would start a NEW session
    anyway.) Pinned here so the deferral logic's reachability story
    stays honest: the clamped-timeout emulation matters when the
    functions are driven directly (replays / harnesses with a nonzero
    watermark), which test_bucketed_late_fold_defers_like_per_user
    covers at the unit level."""
    import datetime

    from reddit_data_engineering_project_spark.streaming.stateful import (
        run_session_stream,
        run_session_stream_bucketed,
    )

    def drop(src, rows):
        pdf = spark.createDataFrame(
            [
                (e, datetime.datetime.fromisoformat(t), u, "view", 1.0)
                for e, t, u in rows
            ],
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double",
        )
        pdf.coalesce(1).write.mode("append").parquet(src)

    # Batch 1 advances the watermark to 01:00, stranding user 1's
    # deadline (00:30) behind it. Batches 2-3 are LATE user-1 events
    # (each within gap of the previous) — the watermark filter drops
    # them. Batches 4-5 advance the watermark so user 1's singleton
    # closes by timeout.
    files = [
        [(1, "2024-01-01 00:00:00", 1), (2, "2024-01-01 01:00:00", 2)],
        [(3, "2024-01-01 00:10:00", 1)],
        [(4, "2024-01-01 00:20:00", 1)],
        [(5, "2024-01-01 06:00:00", 2)],
        [(6, "2024-01-01 07:00:00", 2)],
    ]
    outs = {}
    for tag, runner, kwargs in (
        ("per_user", run_session_stream, {}),
        ("bucketed", run_session_stream_bucketed, {"n_buckets": 1}),
    ):
        src = os.path.join(str(tmp_path), f"src_{tag}")
        sink = os.path.join(str(tmp_path), f"sink_{tag}")
        ckpt = os.path.join(str(tmp_path), f"ckpt_{tag}")
        for rows in files:
            drop(src, rows)
            runner(spark, src, sink, ckpt, **kwargs)
        out = (
            spark.read.option("recursiveFileLookup", True)
            .parquet(sink)
            .collect()
        )
        outs[tag] = sorted(
            (r.user_id, r.session_start, r.session_end, r.n_events,
             r.closed_by)
            for r in out
        )
    assert outs["per_user"] == outs["bucketed"]
    import pandas as pd

    u1 = [o for o in outs["per_user"] if o[0] == 1]
    # the late events were filtered, not folded: a 1-event session
    assert [(o[3], o[4]) for o in u1] == [(1, "timeout")]
    assert u1[0][1] == u1[0][2] == pd.Timestamp("2024-01-01 00:00:00")


def test_bucketed_late_fold_defers_like_per_user():
    """Unit-level late-arrival deferral (r11 advice): when the
    transition functions are driven directly with a NONZERO watermark
    (replay/harness territory — the live runners' watermark filter
    makes this unreachable, see the test above), a late event that
    extends a behind-deadline session must NOT timeout-close in the
    same invocation on the bucketed path: the per-user operator clamps
    its timeout to wm+1 and defers, and the bucketed state now carries
    that CLAMPED instant per user. An untouched user whose clamped
    timeout fell behind the watermark still closes."""
    import pandas as pd

    from reddit_data_engineering_project_spark.streaming.stateful import (
        _SESSION_GAP_MS,
        close_idle_sessions,
        close_idle_sessions_bucketed,
    )
    from reddit_data_engineering_project_spark.streaming.stream_queries import (
        _ReplayGroupState,
    )

    class _WmState(_ReplayGroupState):
        __slots__ = ("wm_ms",)

        def __init__(self, wm_ms):
            super().__init__()
            self.wm_ms = wm_ms

        def getCurrentWatermarkMs(self):
            return self.wm_ms

    us = lambda iso: int(pd.Timestamp(iso).value // 1000)  # noqa: E731
    ms = lambda iso: us(iso) // 1000  # noqa: E731
    wm = ms("2024-01-01 01:00:00")  # deadline 00:30 is behind this

    def batch(rows):  # rows: (event_id, iso_ts, user_id)
        return pd.DataFrame(
            {
                "user_id": [u for _, _, u in rows],
                "ts_us": [us(t) for _, t, _ in rows],
                "event_id": [e for e, _, _ in rows],
            }
        )

    # Per-user: open session (00:00, 00:00, 1); late 00:10 merges and
    # the timeout clamps to wm+1 — no emission this invocation.
    st = _WmState(wm)
    st.update((us("2024-01-01 00:00:00"), us("2024-01-01 00:00:00"), 1))
    out = list(
        close_idle_sessions(
            (1,), iter([batch([(3, "2024-01-01 00:10:00", 1)])]), st
        )
    )
    assert out == []
    assert st.get == (
        us("2024-01-01 00:00:00"), us("2024-01-01 00:10:00"), 2,
    )
    assert st.timeout_ts == wm + 1

    # Bucketed: same user 1 plus an UNTOUCHED user 2 whose clamped
    # timeout fell behind the watermark. User 1 must merge-and-defer
    # (not timeout-close this invocation); user 2 must close.
    stb = _WmState(wm)
    stb.update(
        (
            [1, 2],
            [us("2024-01-01 00:00:00"), us("2024-01-01 00:05:00")],
            [us("2024-01-01 00:00:00"), us("2024-01-01 00:05:00")],
            [1, 1],
            [ms("2024-01-01 00:30:00"), ms("2024-01-01 00:35:00")],
        )
    )
    out = list(
        close_idle_sessions_bucketed(
            (0,), iter([batch([(3, "2024-01-01 00:10:00", 1)])]), stb
        )
    )
    (frame,) = out
    closed = sorted(
        zip(frame["user_id"], frame["n_events"], frame["closed_by"])
    )
    assert closed == [(2, 1, "timeout")]
    # user 1's merged session stays open, timeout clamped to wm+1
    uids, starts, lasts, ns, touts = stb.get
    assert list(uids) == [1]
    assert (starts[0], lasts[0], ns[0]) == (
        us("2024-01-01 00:00:00"), us("2024-01-01 00:10:00"), 2,
    )
    assert touts[0] == wm + 1
    assert stb.timeout_ts == wm + 1

    # Next invocation, watermark unchanged: user 1 must STILL not
    # close (Spark fires only when timeout < watermark), and a further
    # within-gap late event merges to n=3 — the divergence the old
    # deadline-recomputing expiry scan produced.
    out = list(
        close_idle_sessions_bucketed(
            (0,), iter([batch([(4, "2024-01-01 00:20:00", 1)])]), stb
        )
    )
    assert out == []
    uids, starts, lasts, ns, touts = stb.get
    assert list(ns) == [3]
    # Watermark finally moves past the clamp: pure-timeout invocation
    # closes the merged 3-event session — matching what per-user's
    # hasTimedOut branch would emit.
    stb2 = _WmState(wm + 2)
    stb2._v = stb.get
    stb2.hasTimedOut = True
    (frame,) = list(close_idle_sessions_bucketed((0,), iter([]), stb2))
    assert list(frame["n_events"]) == [3]
    assert list(frame["closed_by"]) == ["timeout"]
    assert not stb2.exists
