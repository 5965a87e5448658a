"""Pipeline run metrics (reference R11).

The reference counts rows as it writes and logs the total
(reference ``etls/reddit_etl.py:112-117``). The Spark-native form is
``DataFrame.observe``: metrics are accumulated ON the executors DURING
the action that already runs — a second ``df.count()`` pass (the naive
translation) would re-read the input, which at 100 TB means re-reading
100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, functions as F


def with_run_metrics(df: DataFrame, value_col: str | None = None):
    """Attach ingest metrics; returns ``(observed_df, observation)``.

    Metrics materialize when the returned DataFrame's action runs:
    ``observation.get`` then yields ``n_rows`` (and value sum/null count
    when ``value_col`` is given) without any extra job.
    """
    obs = Observation("run_metrics")
    metrics = [F.count(F.lit(1)).alias("n_rows")]
    if value_col is not None:
        metrics.append(F.sum(F.col(value_col)).alias("value_sum"))
        metrics.append(
            F.sum(F.col(value_col).isNull().cast("long")).alias("value_nulls")
        )
    return df.observe(obs, *metrics), obs
