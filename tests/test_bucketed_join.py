"""Bucketed co-located join: the write-once-shuffle-never contract, and
salted joins producing identical results to plain joins."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from reddit_data_engineering_project_spark.operators.bucketing import (
    bucketed_join_ready,
    salted_join,
    write_bucketed,
)
from reddit_data_engineering_project_spark.tables import table

from conftest import SF_DIR


from conftest import plan_of as _plan


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    wh = os.path.join(str(tmp_path), "wh")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bucketed_test LOCATION '{wh}'")
    orders = table(spark, SF_DIR, "orders").select("o_orderkey", "o_totalprice")
    lineitem = table(spark, SF_DIR, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
    )
    write_bucketed(orders, "bucketed_test.orders_b", "o_orderkey")
    write_bucketed(lineitem, "bucketed_test.lineitem_b", "o_orderkey")

    # Bucketed reads co-locate: sort-merge join with NO shuffle on either
    # side (buckets align task-for-task).
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join_ready(
            spark, "bucketed_test.orders_b", "bucketed_test.lineitem_b",
            "o_orderkey",
        )
        plan = _plan(spark, joined)
        assert "Exchange" not in plan
        assert joined.count() == lineitem.count()
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )


def test_salted_join_matches_plain_join(spark):
    ev = table(spark, SF_DIR, "events").select("event_id", "user_id")
    dim = (
        table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
    )
    plain = ev.join(dim, "user_id")
    salted = salted_join(ev, dim, "user_id", n_salts=4)
    assert salted.count() == plain.count()
    assert salted.exceptAll(plain.select(*salted.columns)).count() == 0
