"""Query registry: the engine's declared operator surface.

Every implemented operator registers a ``(spark, sf_dir) -> DataFrame``
callable plus (when SQL-expressible) the equivalent ANSI SQL for the
DuckDB oracle. ``__spark_entry__.py`` exposes these to the driver, which
compares row-count + schema + order-insensitive value hash at sf=0.01.

Conventions (oracle-parity rules, SURVEY §7 "hard parts"):
- Alias EVERY computed/aggregate column identically on both sides.
- ``events.ts`` is ns-precision parquet; Spark truncates to µs. Oracle SQL
  must therefore ``CAST(ts AS TIMESTAMP)`` (ns→µs) wherever it is output
  or compared.
- Money sums: round the FINAL aggregate (``round(sum(x), 2)``) — both
  engines then snap to the same double.
- Averages/ratios: round to 4-6 decimals.
"""

from __future__ import annotations

import functools
import textwrap
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .session import ensure_session_confs

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}
TAGS: dict[str, tuple[str, ...]] = {}


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    """Register a query under ``name`` with an optional DuckDB oracle SQL.

    Queries without an oracle get the driver's weaker rows-only check
    (reserved for genuinely non-SQL-expressible ops: seeded LSH, streaming
    state machines).
    """

    def deco(fn: QueryFn) -> QueryFn:
        @functools.wraps(fn)
        def wrapper(spark: SparkSession, sf_dir: str) -> DataFrame:
            ensure_session_confs(spark)
            return fn(spark, sf_dir)

        if name in QUERIES:
            raise ValueError(f"duplicate query registration: {name}")
        QUERIES[name] = wrapper
        if oracle is not None:
            ORACLES[name] = textwrap.dedent(oracle).strip()
        if tags:
            TAGS[name] = tuple(tags)
        return wrapper

    return deco


def load_all_operators() -> None:
    """Import every operator module so registrations run."""
    from .operators import (  # noqa: F401
        aggregates,
        dedup,
        joins,
        multimodal,
        product_analytics,
        relational,
        setops,
        similarity,
        sinks,
        text_analysis,
        upsert,
        windows,
    )
    from .functions import scalar, text, udfs  # noqa: F401
    from .streaming import stream_queries  # noqa: F401
    from .transforms import posts  # noqa: F401
