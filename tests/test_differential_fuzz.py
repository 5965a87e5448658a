"""Differential fuzzing: random ANSI-SQL queries, Spark vs DuckDB.

The driver's correctness gate compares hand-written query pairs; this
harness generalizes it — hypothesis draws queries from a small ANSI
grammar (filters, IN-lists, group-bys, aggregate batteries over
lineitem), runs the SAME SQL text through ``spark.sql`` (over the
engine's registered views, the R17 ad-hoc surface) and DuckDB, and
compares row count + order-insensitive value hash with the identical
normalization the oracle gate uses (``tools/check_oracle.py``).

Grammar constraints keep comparisons exact by construction (the SURVEY
§7 "float aggregation drift" rule): sums only over integers or
whole-number-valued doubles (exact under IEEE in any order), no
double-fraction sums, timestamps compared as typed values.
"""

from __future__ import annotations

import os
import sys

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)
from check_oracle import table_hash  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"

#: Deep-sweep multiplier (the per-round fresh-seed ritual): the
#: per-grammar example counts below are sized for the committed suite;
#: SPARK_GRAFT_FUZZ_SCALE=10 turns one pytest invocation into the
#: ~150-examples-per-grammar deep sweep previous rounds ran by hand.
#: Per-test @settings overrides any hypothesis profile, hence a
#: multiplier constant rather than a profile.
_FUZZ_SCALE = max(1, int(os.environ.get("SPARK_GRAFT_FUZZ_SCALE", "1")))

# --- query grammar -------------------------------------------------------

_NUM_COLS = ["l_quantity", "l_linenumber", "l_suppkey"]
_CMP_OPS = ["<", "<=", ">", ">=", "="]
_FLAGS = ["A", "N", "R"]
_STATUS = ["O", "F"]

_num_pred = st.builds(
    lambda col, op, v: f"{col} {op} {v}",
    st.sampled_from(_NUM_COLS),
    st.sampled_from(_CMP_OPS),
    st.integers(min_value=0, max_value=50),
)
_in_pred = st.builds(
    lambda vals: "l_returnflag IN ({})".format(
        ", ".join(f"'{v}'" for v in sorted(vals))
    ),
    st.sets(st.sampled_from(_FLAGS), min_size=1, max_size=3),
)
_status_pred = st.builds(
    lambda v: f"l_linestatus = '{v}'", st.sampled_from(_STATUS)
)
_null_pred = st.just("l_shipdate IS NOT NULL")

_atom = st.one_of(_num_pred, _in_pred, _status_pred, _null_pred)

_predicate = st.builds(
    lambda atoms, joiner: f" {joiner} ".join(f"({a})" for a in atoms),
    st.lists(_atom, min_size=1, max_size=3),
    st.sampled_from(["AND", "OR"]),
)

# exact-by-construction aggregates (integer sums / whole-number doubles /
# min-max / counts)
_AGGS = [
    "count(*) AS n_rows",
    "sum(l_linenumber) AS sum_ln",
    "CAST(sum(l_quantity) AS BIGINT) AS sum_qty",
    "min(l_shipdate) AS min_ship",
    "max(l_shipdate) AS max_ship",
    "count(DISTINCT l_returnflag) AS n_flags",
    "min(l_partkey) AS min_pk",
]

_GROUPS = [
    None,
    "l_returnflag",
    "l_linestatus",
    "l_returnflag, l_linestatus",
]


@st.composite
def _queries(draw) -> str:
    pred = draw(_predicate)
    aggs = draw(
        st.lists(st.sampled_from(_AGGS), min_size=1, max_size=4, unique=True)
    )
    group = draw(st.sampled_from(_GROUPS))
    select = list(aggs)
    tail = ""
    if group is not None:
        select = [group] + select
        tail = f" GROUP BY {group}"
    return (
        f"SELECT {', '.join(select)} FROM lineitem WHERE {pred}{tail}"
    )


# --- join + window grammar ----------------------------------------------

_join_agg = st.sampled_from(
    [
        "count(*) AS n_rows",
        "sum(l_linenumber) AS sum_ln",
        "min(o_orderdate) AS min_od",
        "count(DISTINCT o_orderstatus) AS n_status",
    ]
)


# --- string-function grammar (curation-family primitives) ---------------
#
# Only spellings with IDENTICAL semantics in Spark SQL and DuckDB are
# drawn: regexp_replace is deliberately absent (Spark replaces globally,
# DuckDB needs the 'g' flag — same TEXT would mean different things),
# as are split/string_split and array_join/array_to_string (different
# names per engine). substr starts stay >= 1; split_part fields stay in
# 1..3 (both engines return '' past the end).

_STR_INNER = [
    "text",
    "substr(text, {i}, {n})",
    "replace(text, '{a}', '{b}')",
    "split_part(text, ' ', {f})",
    "lpad(text, {n}, '_')",
    "left(text, {n})",
    "right(text, {n})",
]

_STR_OUTER = [
    "upper({e})",
    "lower({e})",
    "reverse({e})",
    "trim({e})",
    "md5({e})",
    "left({e}, 12)",
]

_WORDS = ["the", "a", "scan", "join", "merge"]


@st.composite
def _string_exprs(draw) -> str:
    inner = draw(st.sampled_from(_STR_INNER)).format(
        i=draw(st.integers(min_value=1, max_value=20)),
        n=draw(st.integers(min_value=1, max_value=30)),
        f=draw(st.integers(min_value=1, max_value=3)),
        a=draw(st.sampled_from(_WORDS)),
        b=draw(st.sampled_from(_WORDS)),
    )
    if draw(st.booleans()):
        inner = draw(st.sampled_from(_STR_OUTER)).format(e=inner)
    return inner


@st.composite
def _string_queries(draw) -> str:
    exprs = draw(st.lists(_string_exprs(), min_size=1, max_size=3))
    select = ["doc_id"] + [
        f"{e} AS e{k}" for k, e in enumerate(exprs)
    ]
    agg = draw(st.booleans())
    if agg:
        return (
            "SELECT lang, count(*) AS n, min(md5({})) AS h "
            "FROM documents GROUP BY lang".format(exprs[0])
        )
    lo = draw(st.integers(min_value=0, max_value=300))
    return (
        f"SELECT {', '.join(select)} FROM documents "
        f"WHERE length(text) > {lo}"
    )


@st.composite
def _join_queries(draw) -> str:
    """lineitem ⋈ orders with a filter on each side, grouped aggregate."""
    pred = draw(_predicate)
    status = draw(st.sampled_from(["O", "F", "P"]))
    aggs = draw(st.lists(_join_agg, min_size=1, max_size=3, unique=True))
    group = draw(st.sampled_from([None, "o_orderstatus", "l_returnflag"]))
    select = list(aggs)
    tail = ""
    if group is not None:
        select = [group] + select
        tail = f" GROUP BY {group}"
    return (
        f"SELECT {', '.join(select)} "
        f"FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        f"WHERE ({pred}) AND o_orderstatus <> '{status}'{tail}"
    )


@st.composite
def _window_queries(draw) -> str:
    """Deterministic window functions over a filtered slice.

    Rank functions need a total order for cross-engine determinism, so
    every ORDER BY ends with the (l_orderkey, l_linenumber) primary key.
    """
    pred = draw(_predicate)
    fn = draw(
        st.sampled_from(
            [
                "row_number()",
                "rank()",
                "dense_rank()",
                "lag(l_linenumber, 1, 0)",
                "lead(l_linenumber, 1, 0)",
                "sum(l_linenumber)",
                "count(*)",
            ]
        )
    )
    part = draw(st.sampled_from(["l_returnflag", "l_linestatus", "l_suppkey"]))
    order_col = draw(st.sampled_from(["l_quantity", "l_partkey"]))
    frame = (
        " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
        if fn.startswith(("sum", "count"))
        else ""
    )
    return (
        f"SELECT l_orderkey, l_linenumber, {fn} OVER ("
        f"PARTITION BY {part} ORDER BY {order_col}, l_orderkey, "
        f"l_linenumber{frame}) AS wval "
        f"FROM lineitem WHERE {pred}"
    )


# --- event-time grammar (the ns-timestamp seam) --------------------------

_ts_unit = st.sampled_from(["hour", "day", "week", "month"])
_etype = st.sampled_from(["view", "click", "purchase", "error", "signup"])


@st.composite
def _event_queries(draw) -> str:
    """Event-time aggregations over the ns-precision events table.

    The engine reads events via nanosAsLong + µs conversion
    (``tables.table``); the DuckDB view below applies the equivalent
    ``CAST(ts AS TIMESTAMP)`` once, so the same SQL text must agree —
    fuzzing the trickiest cross-engine seam (SURVEY §7 hard part #1).

    Harness catch (first fuzz run): ``date_trunc('day'|'week'|'month')``
    returns DATE in DuckDB but TIMESTAMP in Spark — values identical,
    rendered types not. The grammar pins the portable spelling
    (explicit CAST AS TIMESTAMP), the same rule hand-written oracles
    must follow.
    """
    unit = draw(_ts_unit)
    types = draw(st.sets(_etype, min_size=1, max_size=3))
    vmax = draw(st.integers(min_value=10, max_value=500))
    aggs = draw(
        st.lists(
            st.sampled_from(
                [
                    "count(*) AS n",
                    "min(ts) AS first_ts",
                    "max(ts) AS last_ts",
                    "count(DISTINCT user_id) AS n_users",
                ]
            ),
            min_size=1,
            max_size=3,
            unique=True,
        )
    )
    in_list = ", ".join(f"'{t}'" for t in sorted(types))
    return (
        f"SELECT CAST(date_trunc('{unit}', ts) AS TIMESTAMP) AS bucket, "
        f"{', '.join(aggs)} "
        f"FROM events WHERE event_type IN ({in_list}) "
        f"AND coalesce(value, 0.0) <= {vmax} GROUP BY bucket"
    )


@pytest.fixture(scope="module")
def engines(spark):
    import duckdb

    from reddit_data_engineering_project_spark.tables import register_views

    register_views(spark, SF_DIR)
    con = duckdb.connect()
    for t in ("lineitem", "orders", "documents"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    # events: pre-cast ns→µs in the view so the SAME SQL text runs on
    # both engines (the Spark view already has µs via tables.table()).
    con.execute(
        "CREATE VIEW events AS SELECT event_id, "
        "CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props "
        f"FROM read_parquet('{SF_DIR}/events.parquet')"
    )
    return spark, con


def _assert_agree(engines, sql: str) -> None:
    spark, con = engines
    sdf = spark.sql(sql)
    srows = [tuple(r) for r in sdf.collect()]
    res = con.execute(sql)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    assert len(srows) == len(orows), sql
    assert sorted(c.lower() for c in sdf.columns) == sorted(
        c.lower() for c in ocols
    ), sql
    assert table_hash(srows, [c.lower() for c in sdf.columns]) == table_hash(
        orows, [c.lower() for c in ocols]
    ), sql


@settings(
    max_examples=25 * _FUZZ_SCALE,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(sql=_queries())
def test_spark_and_duckdb_agree(engines, sql):
    _assert_agree(engines, sql)


@settings(
    max_examples=15 * _FUZZ_SCALE,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(sql=_join_queries())
def test_join_queries_agree(engines, sql):
    _assert_agree(engines, sql)


@settings(
    max_examples=15 * _FUZZ_SCALE,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(sql=_window_queries())
def test_window_queries_agree(engines, sql):
    _assert_agree(engines, sql)


@settings(
    max_examples=15 * _FUZZ_SCALE,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(sql=_event_queries())
def test_event_time_queries_agree(engines, sql):
    _assert_agree(engines, sql)


@settings(
    max_examples=20 * _FUZZ_SCALE,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(sql=_string_queries())
def test_string_function_queries_agree(engines, sql):
    _assert_agree(engines, sql)


# --- gaps-and-islands session grammar ------------------------------------

_GAP_MINUTES = [5, 15, 30, 60, 240]
_SESSION_FILTERS = [
    "",
    "WHERE event_type = 'view'",
    "WHERE value IS NOT NULL",
    "WHERE user_id % 7 = 3",
    "WHERE event_type IN ('click', 'purchase')",
]


def _session_queries():
    """Sessionization drawn over gap width, pre-filter, and rollup —
    the q21_sessionize_gap shape generalized. All outputs integer-typed
    so agreement is exact by construction; the timestamp subtraction
    compares full-precision intervals identically on both engines."""
    return st.builds(
        lambda m, flt, extra: f"""
        WITH flags AS (
          SELECT user_id, ts, event_id,
            CASE WHEN ts - lag(ts) OVER (
                     PARTITION BY user_id ORDER BY ts, event_id)
                 > INTERVAL {m} MINUTE
                 OR lag(event_id) OVER (
                     PARTITION BY user_id ORDER BY ts, event_id) IS NULL
            THEN 1 ELSE 0 END AS new_session
          FROM events {flt}
        ),
        tagged AS (
          SELECT user_id, event_id,
            sum(new_session) OVER (
                PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
            ) AS session_seq
          FROM flags
        )
        SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
               count(*) AS n_events{extra}
        FROM tagged GROUP BY user_id, session_seq
        """,
        st.sampled_from(_GAP_MINUTES),
        st.sampled_from(_SESSION_FILTERS),
        st.sampled_from(
            ["", ", min(event_id) AS first_event", ", max(event_id) AS last_event"]
        ),
    )


@settings(
    max_examples=15 * _FUZZ_SCALE,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(sql=_session_queries())
def test_session_queries_agree(engines, sql):
    _assert_agree(engines, sql)


# --- value-based RANGE frame grammar -------------------------------------

_RANGE_FNS = [
    "count(*)",
    "sum(summand)",
    "min(k)",
    "max(summand)",
]
_RANGE_PARTS = ["ubucket", "event_type"]


def _range_frame_queries():
    """Value-based RANGE frames fuzzed over frame width, direction, and
    partitioning — the q13_range_interval_frames semantics generalized.

    The order key is ``round(value)`` cast BIGINT, which collides
    heavily, so every drawn frame exercises the peers-enter-together
    RANGE rule (the part a ROWS frame can't see). Aggregates are
    integer-only, NULL keys filtered out (NULL-ordering inside RANGE
    frames is engine-defined — pinned out of scope exactly like the
    hand-written op does by integer-cents construction)."""
    return st.builds(
        lambda fn, part, w, v, m: f"""
        WITH s AS (
          SELECT event_id, event_type,
                 user_id % {m} AS ubucket,
                 CAST(round(value) AS BIGINT) AS k,
                 event_id % 97 AS summand
          FROM events WHERE value IS NOT NULL
        )
        SELECT event_id, CAST({fn} OVER (
            PARTITION BY {part} ORDER BY k
            RANGE BETWEEN {w} PRECEDING AND {v} FOLLOWING
        ) AS BIGINT) AS wval
        FROM s
        """,
        st.sampled_from(_RANGE_FNS),
        st.sampled_from(_RANGE_PARTS),
        st.integers(min_value=0, max_value=50),
        st.integers(min_value=0, max_value=50),
        st.sampled_from([3, 11, 31]),
    )


@settings(
    max_examples=15 * _FUZZ_SCALE,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(sql=_range_frame_queries())
def test_range_frame_queries_agree(engines, sql):
    _assert_agree(engines, sql)


# --- set-operation grammar -----------------------------------------------

_SETOPS = ["UNION", "UNION ALL", "INTERSECT", "EXCEPT", "EXCEPT ALL"]


def _setop_queries():
    """Set operations fuzzed over operator, multiplicity, and each side's
    predicate — the q12 family generalized. Row-identity ops over integer
    key tuples are exact by construction; drawing DISTINCT vs ALL
    variants exercises the bag-vs-set semantics corner (EXCEPT ALL's
    per-duplicate cancellation) where engines most plausibly diverge."""
    return st.builds(
        lambda p1, p2, op: f"""
        SELECT l_orderkey, l_linenumber, l_suppkey
        FROM lineitem WHERE {p1}
        {op}
        SELECT l_orderkey, l_linenumber, l_suppkey
        FROM lineitem WHERE {p2}
        """,
        _predicate,
        _predicate,
        st.sampled_from(_SETOPS),
    )


@settings(
    max_examples=15 * _FUZZ_SCALE,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(sql=_setop_queries())
def test_setop_queries_agree(engines, sql):
    _assert_agree(engines, sql)


@st.composite
def _signbit_queries(draw):
    """IEEE sign-bit / rounded-double render fuzz (the r11 extreme-value
    class made permanent). Every metric renders through the canonical
    ``round(x * 100.0) / 100.0 + 0.0`` spelling — the ``+ 0.0`` is the
    -0.0 canonicalizer ``dround``/``dround_sql`` carry, and this grammar
    manufactures -0.0 from data (``-(v - v)``, ``min`` of negated
    zeros) so a future helper or engine change that reintroduces the
    sign-bit divergence fails here, not at the next hostile sweep.
    min/max preserve -0.0 on both engines; sum normalizes it; equality
    treats -0.0 = 0.0 — all three paths are drawn."""
    v = "coalesce(value, 0.0)"
    base = draw(
        st.sampled_from(
            [
                v,
                f"-{v}",
                f"-({v} - {v})",          # -0.0 for every present value
                f"least({v} * -1.0, 0.0)",
                f"greatest(-{v}, -0.5)",
                f"CASE WHEN {v} - {v} = 0.0 THEN -({v} - {v}) ELSE {v} END",
            ]
        )
    )
    agg = draw(st.sampled_from(["min", "max", "sum"]))
    grp = draw(st.sampled_from(["event_type", "user_id % 7", "1"]))
    return (
        f"SELECT {grp} AS g, "
        f"round({agg}({base}) * 100.0) / 100.0 + 0.0 AS m, "
        f"count(*) AS n FROM events GROUP BY 1"
    )


@settings(
    max_examples=15 * _FUZZ_SCALE,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(sql=_signbit_queries())
def test_signbit_render_queries_agree(engines, sql):
    _assert_agree(engines, sql)
