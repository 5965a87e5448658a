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

import re

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


#: Characters Spark's string→long cast strips from both ends before
#: parsing: ASCII control chars and space (ord ≤ 0x20). Verified
#: empirically: CAST('1\\x1b' AS LONG) = 1, CAST('\\x085\\x00') = 5,
#: while \\xa0 and Unicode spaces are NOT stripped (cast → null → 0).
_CAST_STRIP = "".join(chr(i) for i in range(0x21))

#: What Spark's non-ANSI cast accepts after that strip: optional sign,
#: digits, optionally a fraction (truncated toward zero). No exponent,
#: no separators.
_CASTABLE = re.compile(r"([+-]?\d+)(?:\.\d*)?", re.ASCII)


def _spark_long(v: str | None) -> int:
    """Model of ``falsy_long``: trim, cast-or-null, default 0.

    Documented divergences from Python ``int(x or 0)`` (which raises on
    anything non-integral): control-char padding is tolerated, decimal
    strings truncate toward zero, and all other garbage maps to the
    default instead of crashing.
    """
    if v is None:
        return 0
    core = v.strip(_CAST_STRIP)
    m = _CASTABLE.fullmatch(core)
    return int(m.group(1)) if m else 0


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(_WIRE, min_size=1, max_size=8))
def test_falsy_long_matches_python_semantics(spark, values):
    got = _eval(spark, falsy_long, values)
    for v, g in zip(values, got):
        expected = _spark_long(v)
        # On the reference's own domain (clean integer wires or falsy),
        # the model must also agree with Python int(x or 0) exactly.
        s = v.strip() if v is not None else None
        if s is None or s == "" or _is_long(s):
            assert expected == int(s or 0)
        assert g == expected, (v, g, expected)


def _is_long(s: str) -> bool:
    t = s[1:] if s[:1] in "+-" else s
    return t.isascii() and t.isdigit()  # Spark's cast rejects non-ASCII digits


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
