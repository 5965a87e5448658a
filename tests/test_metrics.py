"""R11 run metrics ride the existing action — no second scan."""

from __future__ import annotations

from pyspark.sql import functions as F

from reddit_data_engineering_project_spark.metrics import with_run_metrics
from reddit_data_engineering_project_spark.tables import table

from conftest import SF_DIR


def test_observe_counts_during_single_action(spark, tmp_path):
    ev = table(spark, SF_DIR, "events").select("event_id", "value")
    observed, obs = with_run_metrics(ev, "value")
    observed.write.mode("overwrite").parquet(f"{tmp_path}/out")
    got = obs.get
    assert got["n_rows"] == ev.count()
    assert got["value_nulls"] == ev.filter(F.col("value").isNull()).count()
    expected_sum = ev.agg(F.sum("value")).first()[0]
    assert abs(got["value_sum"] - expected_sum) < 1e-6
