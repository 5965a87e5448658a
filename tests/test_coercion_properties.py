"""Property-based checks of the R5/R6/R7 coercion semantics.

The reference pins these semantics with a handful of golden rows
(reference ``tests/test_reddit_etl.py``); hypothesis generalizes them:
for ANY wire string, the Spark expressions must agree with the Python
idioms ``int(x or 0)`` / ``str(x or d)`` / ``str(x or '').strip()`` on
the domain where the reference's own code would not crash (numeric or
falsy wires — the cast-or-crash divergence on garbage numerics is
documented in ``transforms/posts.py``).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F

from reddit_data_engineering_project_spark.transforms.posts import (
    falsy_long,
    falsy_string,
    trimmed,
)

_WIRE = st.one_of(
    st.none(),
    st.just(""),
    st.integers(min_value=-(10**15), max_value=10**15).map(str),
    st.text(alphabet=" \t", max_size=3),  # whitespace-only
    st.text(max_size=12),  # arbitrary garbage (falsy_long -> 0)
)


def _eval(spark, col_expr, values):
    df = spark.createDataFrame([(v,) for v in values], "x string")
    return [r[0] for r in df.select(col_expr(F.col("x"))).collect()]


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(_WIRE, min_size=1, max_size=8))
def test_falsy_long_matches_python_semantics(spark, values):
    got = _eval(spark, falsy_long, values)
    for v, g in zip(values, got):
        s = v.strip() if v is not None else None
        try:
            expected = int(s or 0)
        except (ValueError, TypeError):
            expected = 0  # documented divergence: default, never crash
        if s is not None and s != "" and not _is_long(s):
            expected = 0
        assert g == expected, (v, g, expected)


def _is_long(s: str) -> bool:
    t = s[1:] if s[:1] in "+-" else s
    return t.isdigit()


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(st.one_of(st.none(), st.text(max_size=12)), min_size=1, max_size=8))
def test_falsy_string_and_trim_match_python(spark, values):
    got_def = _eval(spark, lambda c: falsy_string(c, "Unknown"), values)
    got_trim = _eval(spark, trimmed, values)
    for v, gd, gt in zip(values, got_def, got_trim):
        assert gd == str(v or "Unknown"), (v, gd)
        assert gt == str(v or "").strip(), (v, gt)
