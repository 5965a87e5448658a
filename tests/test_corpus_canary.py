"""Corpus-drift canary: loader dtypes must be stable at every SF present.

The driver regenerates ``/root/testdata`` between rounds; between rounds 3
and 4 ``events.ts`` silently changed from ns-precision parquet (read as
``bigint`` via ``nanosAsLong``) to plain ``timestamp[us]`` (read as
``TIMESTAMP_NTZ``), which broke every events-touching query until the
loader learned to branch on the observed dtype (``tables.py``). This test
pins the POST-LOAD contract — what every operator and every oracle hash
depends on — so the next fixture regeneration fails loudly here instead of
silently zeroing the driver grade.
"""

from __future__ import annotations

import os

import pytest

from reddit_data_engineering_project_spark.tables import TABLE_NAMES, table

# Post-`table()` dtypes every downstream operator assumes. `events.ts`
# MUST come out `timestamp` (session-TZ, UTC) regardless of how the
# parquet file encodes it.
EXPECTED_DTYPES: dict[str, dict[str, str]] = {
    "region": {"r_regionkey": "int", "r_name": "string"},
    "nation": {
        "n_nationkey": "int",
        "n_name": "string",
        "n_regionkey": "int",
    },
    "customer": {
        "c_custkey": "bigint",
        "c_name": "string",
        "c_nationkey": "int",
        "c_acctbal": "double",
        "c_mktsegment": "string",
    },
    "supplier": {
        "s_suppkey": "bigint",
        "s_name": "string",
        "s_nationkey": "int",
        "s_acctbal": "double",
    },
    "part": {
        "p_partkey": "bigint",
        "p_name": "string",
        "p_brand": "string",
        "p_type": "string",
        "p_size": "int",
        "p_retailprice": "double",
    },
    "orders": {
        "o_orderkey": "bigint",
        "o_custkey": "bigint",
        "o_orderstatus": "string",
        "o_totalprice": "double",
        "o_orderdate": "timestamp_ntz",
        "o_orderpriority": "string",
    },
    "lineitem": {
        "l_orderkey": "bigint",
        "l_partkey": "bigint",
        "l_suppkey": "bigint",
        "l_linenumber": "int",
        "l_quantity": "double",
        "l_extendedprice": "double",
        "l_discount": "double",
        "l_tax": "double",
        "l_returnflag": "string",
        "l_linestatus": "string",
        "l_shipdate": "timestamp_ntz",
    },
    "events": {
        "event_id": "bigint",
        "ts": "timestamp",  # the regression this canary exists to catch
        "user_id": "bigint",
        "event_type": "string",
        "value": "double",
        "props": "string",
    },
    "documents": {
        "doc_id": "bigint",
        "text": "string",
        "lang": "string",
        "source": "string",
        "n_chars": "bigint",
    },
    "embeddings": {
        "vec_id": "bigint",
        "embedding": "array<float>",
        "label": "int",
    },
}

SF_DIRS = [
    d
    for d in (
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    )
    if os.path.isdir(d)
]


@pytest.mark.parametrize("sf_dir", SF_DIRS)
@pytest.mark.parametrize("name", TABLE_NAMES)
def test_loader_dtypes_stable(spark, sf_dir, name):
    observed = dict(table(spark, sf_dir, name).dtypes)
    expected = EXPECTED_DTYPES[name]
    assert observed == expected, (
        f"{name} at {sf_dir}: loader dtypes drifted.\n"
        f"  expected: {expected}\n  observed: {observed}\n"
        "The driver likely regenerated the corpus with a new physical "
        "schema; update tables.py to normalize it back to this contract."
    )


@pytest.mark.skipif(not SF_DIRS, reason="no fixture corpus present")
def test_events_ts_values_sane(spark):
    """ts must decode to plausible wall-clock values, not epoch-garbage."""
    import pyspark.sql.functions as F

    row = (
        table(spark, SF_DIRS[0], "events")
        .agg(
            F.min("ts").alias("lo"),
            F.max("ts").alias("hi"),
            F.count(F.when(F.col("ts").isNull(), 1)).alias("nulls"),
        )
        .first()
    )
    assert row["nulls"] == 0
    assert row["lo"].year >= 1990, row
    assert row["hi"].year <= 2100, row
