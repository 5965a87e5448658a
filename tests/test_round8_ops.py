"""Invariant tests for the round-8 fixes and operators.

The oracle gate pins exact values on the fixture corpus; these tests pin
contracts on crafted inputs the fixtures cannot exhibit: zero-length
payloads through the framed-energy spine (Spark's descending-sequence
default would otherwise fabricate frames), and non-numeric VARIANT
values through the typed presence count.
"""

from __future__ import annotations

from pyspark.sql import Row, functions as F

from reddit_data_engineering_project_spark.operators import multimodal
from reddit_data_engineering_project_spark.functions import text as textfns
from reddit_data_engineering_project_spark.registry import ORACLES


def _write_documents(spark, tmp_path, rows):
    """Materialize a crafted documents table as an sf_dir.

    rows: (doc_id, text, source)
    """
    df = spark.createDataFrame(
        [
            Row(
                doc_id=r[0],
                text=r[1],
                lang="en",
                source=r[2],
                n_chars=len(r[1]),
            )
            for r in rows
        ]
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


def _write_events(spark, tmp_path, rows):
    """Materialize a crafted events table as an sf_dir.

    rows: (event_id, ts_iso, user_id, event_type, value, props_json)
    """
    df = spark.createDataFrame(
        [
            Row(
                event_id=r[0],
                ts=r[1],
                user_id=r[2],
                event_type=r[3],
                value=float(r[4]),
                props=r[5],
            )
            for r in rows
        ]
    ).withColumn("ts", F.to_timestamp("ts"))
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    return str(tmp_path)


# ----------------------------------------------------- payload energy guard


def test_payload_energy_empty_payload_emits_no_frames(spark, tmp_path):
    """An empty payload must produce ZERO frame rows, not the two bogus
    frames Spark's sequence(0, -1) descending default would fabricate
    (ADVICE r7: DuckDB's generate_series(0, -1) is empty, so an
    unguarded spine hash-mismatches on any corpus with empty text)."""
    sf = _write_documents(
        spark,
        tmp_path,
        [(1, "", "web"), (2, "abc", "web"), (3, "x" * 300, "web")],
    )
    out = multimodal.x05_payload_energy(spark, sf).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert 1 not in by_doc, "empty payload fabricated frames"
    # 3-byte payload: one frame, 3 samples, exact integer energy.
    (f2,) = by_doc[2]
    assert f2.frame_idx == 0 and f2.n_samples == 3
    assert f2.energy == sum((b - 128) ** 2 for b in b"abc")
    # 300-byte payload: two frames (256 + 44) — framing still intact.
    assert [(r.frame_idx, r.n_samples) for r in sorted(
        by_doc[3], key=lambda r: r.frame_idx)] == [(0, 256), (1, 44)]


# ------------------------------------------------- variant typed presence


def test_variant_shred_nonnumeric_k_counts_as_absent(spark, tmp_path):
    """``n_with_k`` counts rows whose ``k`` is long-castable — a string
    or object value of ``k`` is ABSENT under the typed lens on BOTH
    engines (ADVICE r7: the oracle previously counted any non-null
    ``k``, diverging on non-numeric values)."""
    import duckdb

    rows = [
        (1, "2024-01-01 00:00:00", 10, "view", 1.0, '{"k": 7}'),
        (2, "2024-01-01 00:01:00", 10, "view", 1.0, '{"k": "seven"}'),
        (3, "2024-01-01 00:02:00", 10, "view", 1.0, '{"k": {"a": 1}}'),
        (4, "2024-01-01 00:03:00", 10, "view", 1.0, '{"other": 1}'),
        (5, "2024-01-01 00:04:00", 10, "view", 1.0, '{"k": 5}'),
    ]
    sf = _write_events(spark, tmp_path, rows)
    got = {
        r.event_type: r
        for r in textfns.q17_variant_shred(spark, sf).collect()
    }
    assert got["view"].n_events == 5
    assert got["view"].n_with_k == 2
    assert got["view"].sum_k == 12

    con = duckdb.connect()
    glob = (sf + "/events.parquet/*.parquet").replace("'", "''")
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{glob}')"
    )
    oracle = con.execute(ORACLES["q17_variant_shred"]).fetchall()
    (o,) = oracle
    assert (o[1], o[2], o[3]) == (5, 2, 12)
