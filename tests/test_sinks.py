"""Sink round-trips: R10 header-CSV parity and Q18 partitioned parquet."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from reddit_data_engineering_project_spark.operators.sinks import (
    write_csv_header,
    write_partitioned_parquet,
)
from reddit_data_engineering_project_spark.tables import table

from conftest import SF_DIR


def test_csv_sink_has_header_and_roundtrips(spark, tmp_path):
    out = os.path.join(str(tmp_path), "csv_out")
    df = table(spark, SF_DIR, "nation")
    write_csv_header(df, out)
    # R10 parity: a header line in the raw file.
    part = glob.glob(os.path.join(out, "part-*.csv"))[0]
    with open(part, encoding="utf-8") as fh:
        assert fh.readline().strip() == "n_nationkey,n_name,n_regionkey"
    back = spark.read.option("header", True).option("inferSchema", True).csv(out)
    assert back.count() == df.count()
    assert set(back.columns) == set(df.columns)


def test_partitioned_parquet_layout_and_values(spark, tmp_path):
    out = os.path.join(str(tmp_path), "pq_out")
    ev = table(spark, SF_DIR, "events").select(
        "event_id",
        "ts",
        F.coalesce(F.col("value"), F.lit(0.0)).alias("value"),
        F.to_date(F.date_trunc("day", F.col("ts"))).alias("ds"),
    )
    write_partitioned_parquet(ev, out, "ds")
    # Hive-style day directories exist.
    days = glob.glob(os.path.join(out, "ds=*"))
    assert len(days) == ev.select("ds").distinct().count()
    back = spark.read.parquet(out)
    assert back.count() == ev.count()
    # Partition pruning: reading one day touches only that directory.
    one_day = ev.select("ds").first()[0]
    pruned = back.filter(F.col("ds") == F.lit(one_day))
    plan = spark._jvm.PythonSQLUtils.explainString(
        pruned._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters: [" in plan
    assert pruned.count() == ev.filter(F.col("ds") == F.lit(one_day)).count()
