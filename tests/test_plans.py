"""Physical-plan assertions: the scale contracts, checked mechanically.

The 100 TB design points (broadcast dims, pushdown, TakeOrderedAndProject)
are claims about the PHYSICAL plan, so the tests read the plan: if a
refactor silently turns the dim join into a sort-merge or de-pushes a
filter, these fail before any benchmark notices.
"""

from __future__ import annotations

from reddit_data_engineering_project_spark import registry

from conftest import SF_DIR

registry.load_all_operators()


def _plan(spark, name: str) -> str:
    df = registry.QUERIES[name](spark, SF_DIR)
    return spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_broadcast_dim_join_is_broadcast(spark):
    plan = _plan(spark, "q10_join_broadcast_dims")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_star_join_broadcasts_all_dims(spark):
    plan = _plan(spark, "q10_join_inner_star")
    # customer/nation/region all ride in as broadcasts.
    assert plan.count("BroadcastHashJoin") >= 3


def test_projection_prunes_scan(spark):
    plan = _plan(spark, "q02_projection_pruning")
    # 5 of 11 lineitem columns in the parquet ReadSchema, and no more.
    assert "l_orderkey" in plan and "l_extendedprice" in plan
    assert "l_shipdate" not in plan  # unused column never deserialized


def test_filters_push_to_parquet(spark):
    plan = _plan(spark, "q03_filter_predicates")
    assert "PushedFilters: [" in plan
    assert "o_totalprice" in plan.split("PushedFilters")[1][:400]


def test_global_topk_avoids_total_sort(spark):
    plan = _plan(spark, "q04_topk")
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan


def test_star_report_plan_contracts(spark):
    plan = _plan(spark, "q10_star_report")
    # Per-nation top-3 prunes during the sort, nation rides as broadcast,
    # and the date predicate reaches the orders parquet scan.
    assert "WindowGroupLimit" in plan
    assert "BroadcastHashJoin" in plan
    assert "PushedFilters" in plan and "o_orderdate" in plan


def test_range_join_broadcasts_tiny_side(spark):
    plan = _plan(spark, "q11_range_join_bands")
    assert "BroadcastNestedLoopJoin" in plan


def test_asof_join_has_single_shuffle_no_range_join(spark):
    plan = _plan(spark, "q11_asof_join")
    # Union trick: no join node at all, one hash exchange for the window.
    assert "Join" not in plan
    assert plan.count("+- Exchange") == 1
    assert "hashpartitioning(user_id" in plan
