"""Golden-value tests for the reference transform semantics (R4-R9).

Ports the reference's unit suite (reference ``tests/test_reddit_etl.py:
6-42``) onto the Spark-native transform: the dirty-input row, the
minimal-row defaults, the edited type-dispatch, and the falsy-string
coercions — including the golden timestamp ``2024-03-09T16:00:00+00:00``
(reference ``tests/test_reddit_etl.py:30``).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from reddit_data_engineering_project_spark.transforms.posts import (
    clean_posts,
    iso_utc,
    posts_from_rows,
)


def _clean_rows(spark, rows):
    df = clean_posts(posts_from_rows(spark, rows))
    out = df.withColumn("created_utc_iso", iso_utc(F.col("created_utc")))
    return {r["id"]: r.asDict() for r in out.collect()}


def test_dirty_row_golden(spark):
    """Reference test_transform_post_success: every coercion at once."""
    got = _clean_rows(
        spark,
        [
            {
                "id": "12345",
                "title": "  Messy Title  ",
                "score": "100",
                "num_comments": None,
                "over_18": None,
                "created_utc": 1710000000,
                "author": "some_user",
            }
        ],
    )["12345"]
    assert got["title"] == "Messy Title"  # R7 trim
    assert got["score"] == 100  # R5 string '100' -> int
    assert got["num_comments"] == 0  # R5 None -> 0
    assert got["author"] == "some_user"  # R6 passthrough
    assert got["over_18"] is False  # R8 None -> False
    # R4 golden timestamp, tz-aware UTC render
    assert got["created_utc_iso"] == "2024-03-09T16:00:00+00:00"


def test_minimal_row_defaults(spark):
    """Reference test: {'id':'123'} -> typed defaults everywhere."""
    got = _clean_rows(spark, [{"id": "123"}])["123"]
    assert got["title"] == ""
    assert got["score"] == 0
    assert got["num_comments"] == 0
    assert got["author"] == "Unknown"
    assert got["created_utc"] is None  # null epoch passes through
    assert got["over_18"] is False
    assert got["edited"] is False
    assert got["spoiler"] is False
    assert got["stickied"] is False


def test_edited_type_dispatch(spark):
    """R9: keep only genuine booleans; float edit-times -> False."""
    got = _clean_rows(
        spark,
        [
            {"id": "a", "edited": "1710000123.0"},  # float edit-time wire
            {"id": "b", "edited": "true"},
            {"id": "c", "edited": "false"},
            {"id": "d", "edited": "True"},  # case-insensitive
        ],
    )
    assert got["a"]["edited"] is False
    assert got["b"]["edited"] is True
    assert got["c"]["edited"] is False
    assert got["d"]["edited"] is True


def test_falsy_string_coercions(spark):
    """R5/R6: empty strings behave as missing (`int('' or 0)` idiom)."""
    got = _clean_rows(
        spark,
        [{"id": "x", "score": "", "author": "", "title": None}],
    )["x"]
    assert got["score"] == 0
    assert got["author"] == "Unknown"
    assert got["title"] == ""


def test_nonnumeric_score_is_default_not_crash(spark):
    """Documented divergence: bad numerics -> default (not cast-or-crash)."""
    got = _clean_rows(spark, [{"id": "y", "score": "not-a-number"}])["y"]
    assert got["score"] == 0
