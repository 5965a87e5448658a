"""R14 driver parity: one call runs source → clean → CSV sink → count,
with the reference's golden values on the wire and a working limit cap."""

from __future__ import annotations

import csv
import glob
import os

from reddit_data_engineering_project_spark.pipeline import run_pipeline
from reddit_data_engineering_project_spark.transforms.posts import (
    GOLDEN_DIRTY_ROWS,
    POST_FIELDS,
)


def test_pipeline_writes_clean_csv_and_counts(spark, tmp_path):
    out = os.path.join(str(tmp_path), "out")
    n = run_pipeline(spark, GOLDEN_DIRTY_ROWS, out)
    assert n == len(GOLDEN_DIRTY_ROWS)

    files = glob.glob(os.path.join(out, "*.csv"))
    assert files
    rows = []
    for f in files:
        with open(f, newline="", encoding="utf-8") as fh:
            reader = csv.DictReader(fh)
            # R10 wire contract: header row present, in the reference's
            # canonical POST_FIELDS order (etls/reddit_etl.py:110-111 —
            # DictWriter fieldnames=POST_FIELDS). The shipped sample CSVs
            # predate the tz fix; the code+tests are authoritative
            # (SURVEY §1.2), hence the ISO '+00:00' assertion below.
            assert reader.fieldnames == POST_FIELDS
            rows.extend(reader)
    assert len(rows) == n
    by_id = {r["id"]: r for r in rows}
    # Reference golden values survive to the wire (tests/test_reddit_etl.py).
    assert by_id["12345"]["title"] == "Messy Title"
    assert by_id["12345"]["score"] == "100"
    assert by_id["12345"]["created_utc"] == "2024-03-09T16:00:00+00:00"
    assert by_id["123"]["author"] == "Unknown"
    assert by_id["e1"]["edited"] == "false"  # float edit-time → False (R9)


def test_pipeline_limit_caps_by_score(spark, tmp_path):
    out = os.path.join(str(tmp_path), "out_topk")
    n = run_pipeline(spark, GOLDEN_DIRTY_ROWS, out, limit=2)
    assert n == 2
    files = glob.glob(os.path.join(out, "*.csv"))
    rows = []
    for f in files:
        with open(f, newline="", encoding="utf-8") as fh:
            rows.extend(csv.DictReader(fh))
    # Top-2 by score: 12345 (100) and e1 (7).
    assert sorted(r["id"] for r in rows) == ["12345", "e1"]
