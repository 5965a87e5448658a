"""Dynamic partition pruning contract: a selective dim filter prunes the
fact scan's partitions at runtime.

At 100 TB the fact table is date/key-partitioned on disk; a star query
filtered on a dim attribute must NOT scan every fact partition. Spark
plants a DPP subquery in the fact scan's PartitionFilters when the join
key is the partition column — this test pins that behavior on a real
partitioned parquet layout written by our own sink path."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from reddit_data_engineering_project_spark.tables import table

from conftest import SF_DIR


def test_fact_scan_partition_pruned_by_dim_filter(spark, tmp_path):
    fact_dir = os.path.join(str(tmp_path), "orders_by_nation")

    # Fact partitioned by customer nation (25 partitions), as a
    # nation-sharded lake layout would be.
    orders = table(spark, SF_DIR, "orders")
    customer = table(spark, SF_DIR, "customer")
    (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .select("o_orderkey", "o_totalprice", "o_orderdate",
                F.col("c_nationkey").alias("nationkey"))
        .write.partitionBy("nationkey")
        .parquet(fact_dir)
    )

    fact = spark.read.parquet(fact_dir)
    nation = table(spark, SF_DIR, "nation").filter(F.col("n_name") == "NATION_7")
    joined = fact.join(nation, fact.nationkey == nation.n_nationkey).select(
        "o_orderkey", "o_totalprice", "n_name"
    )

    plan = spark._jvm.PythonSQLUtils.explainString(
        joined._jdf.queryExecution(), "formatted"
    )
    assert "dynamicpruning" in plan.lower(), plan
    # Sanity (NOT a pruning proof — the join result is the same either
    # way): the query runs and selects a proper nonempty subset. The
    # pruning contract itself is the plan assertion above; verifying
    # files-read would need scan-metrics introspection.
    n_match = joined.count()
    n_total = fact.count()
    assert 0 < n_match < n_total
