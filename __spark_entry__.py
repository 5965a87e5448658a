"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All operators live in ``reddit_data_engineering_project_spark``; this module
only adapts the registry to the driver's interface.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from reddit_data_engineering_project_spark import registry
from reddit_data_engineering_project_spark.session import ensure_session_confs

registry.load_all_operators()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The reference's whole data path as one DataFrame chain (SURVEY §7
    step 1): clean/coerce per transform_post semantics, then top-k by
    value within a trailing time window (the `subreddit.top()` pattern,
    reference etls/reddit_etl.py:49).
    """
    ensure_session_confs(spark)
    return registry.QUERIES["pipeline_topk_window"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Ordered by ``registry.GRADING_PRIORITY``: the driver grades the
    first 50 entries, so the order is an explicit, reviewed artifact
    (see registry.py and tests/test_grading_window.py).
    """
    return registry.ordered_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each SQL-expressible query."""
    return registry.ordered_oracles()
