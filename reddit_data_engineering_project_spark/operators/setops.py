"""Set operators (SURVEY §2.2 Q12).

The reference materializes one file per day (``dags/reddit_dag.py:37``);
consolidating daily partitions and diffing day-over-day activity are set
operations. All four Spark set ops are covered: union (ALL semantics),
unionByName with missing-column fill, intersect (DISTINCT semantics),
exceptAll (bag semantics).

Scale notes (100 TB design point):
- ``union`` is a zero-shuffle metadata concat of the two scans.
- ``intersect`` / ``exceptAll`` shuffle both sides on the full row — they
  are cheap here only because inputs are pre-projected to narrow key
  columns first. Never set-op wide rows at scale; project first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.numeric import dround
from ..registry import register
from ..tables import table


def _day_slice(ev: DataFrame, start_day: int, end_day: int) -> DataFrame:
    """Events with 2024-01 day-of-month in [start_day, end_day]."""
    d = F.dayofmonth("ts")
    return ev.filter((d >= start_day) & (d <= end_day))


@register(
    "q12_union_daily_slices",
    oracle="""
    WITH w1 AS (
        SELECT event_id, user_id, 'week1' AS slice_tag,
               coalesce(value, 0.0) AS value
        FROM events
        WHERE day(CAST(ts AS TIMESTAMP)) BETWEEN 1 AND 7
    ),
    w2 AS (
        SELECT event_id, user_id, 'week2' AS slice_tag,
               coalesce(value, 0.0) AS value
        FROM events
        WHERE day(CAST(ts AS TIMESTAMP)) BETWEEN 8 AND 14
    )
    SELECT slice_tag, count(*) AS n_events,
           round(sum(value) * 100.0) / 100.0 AS total_value
    FROM (SELECT * FROM w1 UNION ALL SELECT * FROM w2)
    GROUP BY 1
    """,
    tags=("setops", "Q12"),
)
def q12_union_daily_slices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of two weekly partitions — multi-day consolidation (R15).

    The Spark plan concatenates the two filtered scans without any
    shuffle; the aggregate after it is the only exchange.
    """
    ev = table(spark, sf_dir, "events")

    def tagged(lo: int, hi: int, tag: str) -> DataFrame:
        return _day_slice(ev, lo, hi).select(
            "event_id",
            "user_id",
            F.lit(tag).alias("slice_tag"),
            F.coalesce(F.col("value"), F.lit(0.0)).alias("value"),
        )

    return (
        tagged(1, 7, "week1")
        .union(tagged(8, 14, "week2"))
        .groupBy("slice_tag")
        .agg(
            F.count("*").alias("n_events"),
            dround(F.sum("value")).alias("total_value"),
        )
    )


@register(
    "q12_union_by_name",
    oracle="""
    SELECT user_id, kind, amount, note FROM (
        SELECT user_id, 'purchase' AS kind,
               coalesce(value, 0.0) AS amount, NULL AS note
        FROM events WHERE event_type = 'purchase'
        UNION ALL
        SELECT user_id, 'error' AS kind, NULL AS amount,
               'needs triage' AS note
        FROM events WHERE event_type = 'error'
    )
    """,
    tags=("setops", "Q12"),
)
def q12_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName with allowMissingColumns: schema-mismatched feeds.

    Heterogeneous daily extracts rarely share exact column sets;
    name-based alignment + null fill is the safe consolidation (positional
    union would silently misalign).
    """
    ev = table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.lit("purchase").alias("kind"),
        F.coalesce(F.col("value"), F.lit(0.0)).alias("amount"),
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id",
        F.lit("error").alias("kind"),
        F.lit("needs triage").alias("note"),
    )
    return purchases.unionByName(errors, allowMissingColumns=True).select(
        "user_id", "kind", "amount", "note"
    )


@register(
    "q12_intersect_users",
    oracle="""
    SELECT user_id FROM events
    WHERE day(CAST(ts AS TIMESTAMP)) BETWEEN 1 AND 7
    INTERSECT
    SELECT user_id FROM events
    WHERE day(CAST(ts AS TIMESTAMP)) BETWEEN 8 AND 14
    """,
    tags=("setops", "Q12"),
)
def q12_intersect_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct): users active in both weeks — retention."""
    ev = table(spark, sf_dir, "events")
    return (
        _day_slice(ev, 1, 7)
        .select("user_id")
        .intersect(_day_slice(ev, 8, 14).select("user_id"))
    )


@register(
    "q12_except_all",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'click'
    EXCEPT ALL
    SELECT user_id FROM events WHERE event_type = 'purchase'
    """,
    tags=("setops", "Q12"),
)
def q12_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (bag semantics): per-user click surplus over purchases.

    Bag difference keeps multiplicity — a user with 5 clicks and 2
    purchases contributes 3 rows — which distinct EXCEPT would lose.
    """
    ev = table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id")
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id")
    return clicks.exceptAll(purchases)


@register(
    "q12_table_diff",
    oracle="""
    WITH old AS (
        SELECT event_id, event_type,
               CAST(round(coalesce(value, 0.0) * 100.0) AS BIGINT) AS cents
        FROM events WHERE event_id % 10 <> 0
    ),
    new AS (
        SELECT event_id, event_type,
               CASE WHEN event_id % 7 = 0
                    THEN CAST(round(coalesce(value, 0.0) * 100.0)
                              AS BIGINT) + 5
                    ELSE CAST(round(coalesce(value, 0.0) * 100.0)
                              AS BIGINT) END AS cents
        FROM events WHERE event_id % 10 <> 1
    )
    SELECT
        CASE
            WHEN o.event_id IS NULL THEN 'added'
            WHEN n.event_id IS NULL THEN 'removed'
            WHEN o.cents <> n.cents OR o.event_type <> n.event_type
                THEN 'changed'
            ELSE 'unchanged'
        END AS change_type,
        CAST(count(*) AS BIGINT) AS n_rows,
        CAST(min(coalesce(o.event_id, n.event_id)) AS BIGINT) AS min_key
    FROM old o
    FULL OUTER JOIN new n ON o.event_id = n.event_id
    GROUP BY 1
    """,
    tags=("setops", "Q12", "diff"),
)
def q12_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12e: keyed table diff — added / removed / changed / unchanged.

    The reconciliation audit every migration, backfill, and
    snapshot-promotion needs: full-outer join two relation versions on
    the key and classify each row's fate, reporting counts per class.
    (The two versions here are deterministic slices/perturbations of
    ``events`` — old drops key%10=0, new drops key%10=1 and bumps
    key%7=0 values — so all four classes are provably non-empty and the
    oracle reproduces them exactly.)

    Set operators (EXCEPT/INTERSECT) can say WHETHER versions differ;
    the keyed diff says per-row WHY (moved vs mutated), which is the
    actionable output. Comparison runs on integer cents.

    Scale shape: one full-outer sort-merge/hash join co-partitioned on
    the key both sides already share at deployment (bucketed snapshot
    layouts join with zero Exchange — q19's bucketing note applies);
    the classifier is a projection, and the roll-up is 4 rows.
    """
    ev = table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.round(F.coalesce(F.col("value"), F.lit(0.0)) * 100.0)
        .cast("bigint")
        .alias("cents"),
    )
    old = ev.filter(F.col("event_id") % 10 != 0).alias("o")
    new = ev.filter(F.col("event_id") % 10 != 1).withColumn(
        "cents",
        F.when(F.col("event_id") % 7 == 0, F.col("cents") + 5).otherwise(
            F.col("cents")
        ),
    ).alias("n")
    joined = old.join(
        new, F.col("o.event_id") == F.col("n.event_id"), "full_outer"
    )
    change = (
        F.when(F.col("o.event_id").isNull(), "added")
        .when(F.col("n.event_id").isNull(), "removed")
        .when(
            (F.col("o.cents") != F.col("n.cents"))
            | (F.col("o.event_type") != F.col("n.event_type")),
            "changed",
        )
        .otherwise("unchanged")
    )
    return joined.groupBy(change.alias("change_type")).agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.min(F.coalesce(F.col("o.event_id"), F.col("n.event_id")))
        .cast("bigint")
        .alias("min_key"),
    )
