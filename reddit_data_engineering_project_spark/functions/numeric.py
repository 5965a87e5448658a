"""Cross-engine-stable numeric helpers.

``ROUND(x, 2)`` is NOT portable across engines for doubles: Spark rounds
the exact decimal expansion of the double (BigDecimal HALF_UP), DuckDB
computes ``round(x*100)/100`` in floating point — they disagree on
halfway-ish inputs (e.g. 973.475 → 973.47 vs 973.48).

``dround`` forces both engines through the *same* float ops: scale,
round-to-integer (both round half away from zero for doubles), divide.
Oracle SQL must use the matching spelling: ``round(x * 100.0) / 100.0``.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def dround(col: Column, digits: int = 2) -> Column:
    """Engine-portable round-to-``digits`` for double expressions.

    The trailing ``+ 0.0`` canonicalizes IEEE negative zero: rounding a
    tiny negative yields ``-0.0`` on some engines and ``0.0`` on others,
    and value-hash comparators render them differently. ``-0.0 + 0.0``
    is ``+0.0`` by IEEE 754, and the add is a no-op for everything else.
    Oracle SQL for negative-capable metrics must append the same
    ``+ 0.0``.
    """
    scale = float(10**digits)
    return F.round(col * F.lit(scale)) / F.lit(scale) + F.lit(0.0)


def dround_sql(expr: str, digits: int = 2) -> str:
    """The DuckDB-side spelling of :func:`dround`."""
    scale = float(10**digits)
    return f"round(({expr}) * {scale}) / {scale} + 0.0"
