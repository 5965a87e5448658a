"""The reference pipeline's row-transform semantics, Spark-first.

Re-expresses ``transform_post`` (reference ``etls/reddit_etl.py:63-85``)
as declarative Column expressions over a typed "dirty wire" schema, plus
the full pipeline (clean → time-window → top-k) as registered queries
over the corpus ``events`` table (the post-stream analog, SURVEY §1.4).

Exact semantics reproduced (SURVEY §1.1, asserted by the reference's
golden tests ``tests/test_reddit_etl.py:25-30``):

- ``int(x or 0)``: ALL falsy values (None, '', 0) → default, numeric
  strings cast. Spark: ``coalesce(nullif(trim(col), '').cast('long'), 0)``.
  (Divergence note: a truthy non-numeric string raises in the reference;
  non-ANSI Spark casts it to null → default. Documented, not replicated —
  cast-or-crash is an anti-pattern at 100 TB.)
- ``str(x or 'Unknown')``: falsy → 'Unknown' (reference ``:76``).
- ``str(x or '').strip()``: trim with empty default (reference ``:77``).
- ``bool(x)`` with False default for flags (reference ``:78-80``).
- ``edited`` kept iff the source value is a *boolean* (Reddit sends a
  float edit-timestamp otherwise) → else False (reference ``:82-83``).
- epoch seconds → timezone-aware UTC timestamp; null passes through
  (reference ``:65-70``; golden value '2024-03-09T16:00:00+00:00').
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    DoubleType,
    StringType,
    StructField,
    StructType,
)

from ..functions.numeric import dround
from ..registry import register
from ..tables import table

#: The reference's canonical 11-column schema
#: (``etls/reddit_etl.py:22``, ``utils/constants.py:28-41``).
POST_FIELDS = [
    "id",
    "title",
    "score",
    "num_comments",
    "author",
    "created_utc",
    "url",
    "over_18",
    "edited",
    "spoiler",
    "stickied",
]

#: Dirty wire format: everything a lenient JSON/API source can send.
#: Strings for fields the reference coerces from arbitrary values;
#: double for the epoch (Reddit sends floats). This is the Spark
#: equivalent of the generator's dict-of-Any rows
#: (reference ``etls/reddit_etl.py:53-55``).
RAW_POST_SCHEMA = StructType(
    [
        StructField("id", StringType(), False),
        StructField("title", StringType(), True),
        StructField("score", StringType(), True),
        StructField("num_comments", StringType(), True),
        StructField("author", StringType(), True),
        StructField("created_utc", DoubleType(), True),
        StructField("url", StringType(), True),
        StructField("over_18", StringType(), True),
        StructField("edited", StringType(), True),
        StructField("spoiler", StringType(), True),
        StructField("stickied", StringType(), True),
    ]
)


def falsy_long(col: Column, default: int = 0) -> Column:
    """``int(x or default)`` — falsy ('' / null / non-numeric) → default.

    Wire divergences from Python ``int()`` (which raises where the cast
    is total), pinned by ``tests/test_coercion_properties.py``:
    non-numeric garbage → default; ASCII control-char padding (ord ≤
    0x20) is trimmed by the cast; decimal strings truncate toward zero
    ('1.5' → 1); non-ASCII digits are rejected → default.
    """
    return F.coalesce(F.nullif(F.trim(col), F.lit("")).cast("long"), F.lit(default))


def falsy_string(col: Column, default: str) -> Column:
    """``str(x or default)`` — null/empty → default."""
    return F.coalesce(F.nullif(col, F.lit("")), F.lit(default))


def trimmed(col: Column) -> Column:
    """``str(x or '').strip()`` — including Unicode whitespace.

    Python ``str.strip()`` removes all Unicode whitespace (NEL, NBSP,
    ideographic space…) plus the C0 separators ``\\x1c``-``\\x1f``,
    while SQL ``trim`` strips only ASCII spaces — real divergences
    surfaced by the property tests. ``(?U)\\s`` covers the Unicode
    White_Space set; the explicit range adds the separators Python's
    ``isspace()`` includes but Unicode does not.
    """
    ws = r"[\s\x1c-\x1f]"
    return F.regexp_replace(
        F.coalesce(col, F.lit("")), rf"(?U)^{ws}+|(?U){ws}+$", ""
    )


def flag_bool(col: Column) -> Column:
    """``bool(x or False)`` for flag columns; unparsable → False.

    Scope note: exact parity holds for boolean-typed wire values (the
    reference's actual input — PRAW sends real booleans). On a STRING
    wire the two diverge by design: Python ``bool('false')`` is True
    (non-empty string) while the Spark cast reads 'false' as False —
    the Spark reading is the correct one for serialized wires, so this
    divergence is intentional and documented, like ``falsy_long``'s.
    """
    return F.coalesce(col.cast("boolean"), F.lit(False))


def edited_bool(col: Column) -> Column:
    """Keep only genuinely-boolean values; floats/timestamps → False.

    The reference's single type-dispatch (``etls/reddit_etl.py:82-83``):
    Reddit's ``edited`` is ``False`` or a float edit-time. On the string
    wire we accept exactly 'true'/'false' (case-insensitive); anything
    else (e.g. '1710000123.0') is not a boolean → False.
    """
    lowered = F.lower(F.trim(col))
    return F.when(lowered.isin("true", "false"), lowered == "true").otherwise(
        F.lit(False)
    )


def epoch_to_utc_ts(col: Column) -> Column:
    """Unix epoch seconds (float) → tz-aware UTC timestamp; null → null.

    Reference ``etls/reddit_etl.py:65-70``; session TZ is pinned to UTC by
    ``session.RUNTIME_CONFS`` so the rendered value is the reference's
    golden '2024-03-09T16:00:00+00:00'.
    """
    return F.timestamp_seconds(col)


def iso_utc(col: Column) -> Column:
    """Render a timestamp as the reference's ISO-8601 '+00:00' string."""
    return F.date_format(col, "yyyy-MM-dd'T'HH:mm:ssxxx")


def clean_posts(raw: DataFrame) -> DataFrame:
    """The full ``transform_post`` as one narrow projection.

    No shuffle: this is a single whole-stage-codegen map over the scan,
    the Spark analog of the reference's O(1)-memory generator pipeline
    (``ARCHITECTURE_EVOLUTION.md:17-25``).
    """
    return raw.select(
        F.col("id"),
        trimmed(F.col("title")).alias("title"),
        falsy_long(F.col("score")).alias("score"),
        falsy_long(F.col("num_comments")).alias("num_comments"),
        falsy_string(F.col("author"), "Unknown").alias("author"),
        epoch_to_utc_ts(F.col("created_utc")).alias("created_utc"),
        F.col("url"),
        flag_bool(F.col("over_18")).alias("over_18"),
        edited_bool(F.col("edited")).alias("edited"),
        flag_bool(F.col("spoiler")).alias("spoiler"),
        flag_bool(F.col("stickied")).alias("stickied"),
    )


def posts_from_rows(spark: SparkSession, rows: list[dict]) -> DataFrame:
    """Test/ingest source: dict rows → typed dirty-wire DataFrame.

    Mirrors the reference's generator source (R1, ``etls/reddit_etl.py:
    53-55``): missing keys become nulls under the explicit schema.
    """
    normalized = []
    for row in rows:
        rec = {}
        for field in RAW_POST_SCHEMA.fields:
            value = row.get(field.name)
            if value is None:
                rec[field.name] = None
            elif field.name == "created_utc":
                rec[field.name] = float(value)
            else:
                rec[field.name] = str(value)
        normalized.append(rec)
    return spark.createDataFrame(normalized, RAW_POST_SCHEMA)


#: Golden dirty-wire fixture rows (FIXTURES.md §A, reference
#: ``tests/test_reddit_etl.py:11-19,36``): the exact inputs the
#: reference's unit tests feed ``transform_post``.
GOLDEN_DIRTY_ROWS: list[dict] = [
    {
        "id": "12345",
        "title": "  Messy Title  ",
        "score": "100",
        "num_comments": None,
        "author": "some_user",
        "created_utc": 1710000000,
        "over_18": None,
    },
    {"id": "123"},
    {"id": "e1", "edited": "1710000123.0", "score": "7"},
    {"id": "e2", "edited": "true", "stickied": "true"},
    {"id": "f1", "score": "", "author": "", "title": None},
    {"id": "f2", "score": "not-a-number", "num_comments": "3"},
]


@register(
    "pipeline_posts_clean_wire",
    oracle="""
    SELECT * FROM (VALUES
        ('12345', 'Messy Title', 100, 0, 'some_user',
         '2024-03-09T16:00:00+00:00', FALSE, FALSE, FALSE, FALSE),
        ('123', '', 0, 0, 'Unknown', NULL, FALSE, FALSE, FALSE, FALSE),
        ('e1', '', 7, 0, 'Unknown', NULL, FALSE, FALSE, FALSE, FALSE),
        ('e2', '', 0, 0, 'Unknown', NULL, FALSE, TRUE, FALSE, TRUE),
        ('f1', '', 0, 0, 'Unknown', NULL, FALSE, FALSE, FALSE, FALSE),
        ('f2', '', 0, 3, 'Unknown', NULL, FALSE, FALSE, FALSE, FALSE)
    ) AS t(id, title, score, num_comments, author, created_utc_iso,
           over_18, edited, spoiler, stickied)
    """,
    tags=("pipeline", "R1", "R5", "R8", "R9", "string-wire"),
)
def pipeline_posts_clean_wire(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R5/R8/R9 string-wire coercions as a registered, oracle-pinned query.

    Runs the full ``clean_posts`` transform over the reference's golden
    dirty rows (R1 dict source → R4-R9 coercions); the oracle is the
    expected output VALUES verbatim — the reference's unit-test
    assertions (``tests/test_reddit_etl.py:25-42``) as a hash check,
    including the golden '2024-03-09T16:00:00+00:00' rendering.
    """
    cleaned = clean_posts(posts_from_rows(spark, GOLDEN_DIRTY_ROWS))
    return cleaned.select(
        "id",
        "title",
        F.col("score").cast("int").alias("score"),
        F.col("num_comments").cast("int").alias("num_comments"),
        "author",
        iso_utc(F.col("created_utc")).alias("created_utc_iso"),
        "over_18",
        "edited",
        "spoiler",
        "stickied",
    )


# ---------------------------------------------------------------------------
# Registered pipeline queries over the corpus `events` table
# ---------------------------------------------------------------------------


@register(
    "pipeline_clean_coerce",
    oracle="""
    SELECT
        event_id,
        date_trunc('second', CAST(ts AS TIMESTAMP)) AS ts_second,
        user_id,
        coalesce(nullif(trim(event_type), ''), 'unknown') AS event_type,
        round(coalesce(value, 0.0) * 100.0) / 100.0 + 0.0 AS value_clean,
        coalesce(CASE WHEN json_valid(props) THEN
                     TRY_CAST(trunc(TRY_CAST(
                         json_extract_string(props, '$.k') AS DOUBLE))
                     AS BIGINT) END, 0) AS prop_k,
        (coalesce(value, 0.0) > 100.0) AS high_value
    FROM events
    """,
    tags=("pipeline", "R4", "R5", "R6", "R7", "R8"),
)
def pipeline_clean_coerce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R4-R9 coercion battery applied to the post-stream analog.

    Every ``transform_post`` semantic exercised on real columns:
    trim+default (R6/R7), falsy-default numeric (R5), epoch↔timestamp
    round-trip (R4), bool coercion (R8). One narrow projection — no
    shuffle, survives any scale.

    Typed-lens parity (probed, round-8 audit): Spark's string→long
    CAST truncates numeric strings toward zero ('7.5' → 7), so the
    oracle mirrors with TRY_CAST-to-DOUBLE + trunc — a bare
    TRY_CAST-to-BIGINT would round (see q17_map_funcs, same lens).
    """
    ev = table(spark, sf_dir, "events")
    return ev.select(
        F.col("event_id"),
        F.date_trunc("second", F.col("ts")).alias("ts_second"),
        F.col("user_id"),
        falsy_string(F.trim(F.col("event_type")), "unknown").alias("event_type"),
        dround(F.coalesce(F.col("value"), F.lit(0.0))).alias("value_clean"),
        F.coalesce(
            F.get_json_object(F.col("props"), "$.k").cast("long"), F.lit(0)
        ).alias("prop_k"),
        (F.coalesce(F.col("value"), F.lit(0.0)) > 100.0).alias("high_value"),
    )


@register(
    "pipeline_topk_window",
    oracle="""
    SELECT
        event_id,
        CAST(ts AS TIMESTAMP) AS ts,
        user_id,
        trim(event_type) AS event_type,
        coalesce(value, 0.0) AS value
    FROM events
    WHERE CAST(ts AS TIMESTAMP) >=
          (SELECT CAST(max(ts) AS TIMESTAMP) FROM events) - INTERVAL 7 DAY
    ORDER BY value DESC, event_id ASC
    LIMIT 100
    """,
    tags=("pipeline", "R2", "topk"),
)
def pipeline_topk_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's flagship access pattern: top-k in a trailing window.

    ``subreddit.top(time_filter='day', limit=100)`` (reference
    ``etls/reddit_etl.py:49``, ``dags/reddit_dag.py:38-39``) re-expressed:
    filter to the trailing 7 days of the stream, order by value desc,
    keep 100. Catalyst compiles the sort+limit to TakeOrderedAndProject —
    no global sort, O(k) per partition + O(k·parts) at the driver, which
    is exactly the plan that survives 100 TB.
    """
    ev = table(spark, sf_dir, "events")
    max_ts = ev.agg(F.max("ts").alias("max_ts"))
    return (
        ev.crossJoin(F.broadcast(max_ts))
        .filter(F.col("ts") >= F.col("max_ts") - F.expr("INTERVAL 7 DAYS"))
        .select(
            "event_id",
            "ts",
            "user_id",
            F.trim(F.col("event_type")).alias("event_type"),
            F.coalesce(F.col("value"), F.lit(0.0)).alias("value"),
        )
        .orderBy(F.col("value").desc(), F.col("event_id").asc())
        .limit(100)
    )


@register(
    "pipeline_daily_ingest",
    oracle="""
    SELECT
        CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS ds,
        count(*) AS n_rows,
        count(DISTINCT user_id) AS n_users,
        round(sum(coalesce(value, 0.0)) * 100.0) / 100.0 AS total_value
    FROM events
    GROUP BY 1
    """,
    tags=("pipeline", "R11", "R15"),
)
def pipeline_daily_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-partition ingest metrics (R11 row-count + R15 daily cadence).

    The reference logs a row count per daily run (``etls/reddit_etl.py:
    112-117``); in-engine that is an observe/groupBy over the event-date
    partition key — the same key a 100 TB lake would partitionBy.
    """
    ev = table(spark, sf_dir, "events")
    return ev.groupBy(
        F.to_date(F.date_trunc("day", F.col("ts"))).alias("ds")
    ).agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("user_id").alias("n_users"),
        dround(F.sum(F.coalesce(F.col("value"), F.lit(0.0)))).alias("total_value"),
    )
