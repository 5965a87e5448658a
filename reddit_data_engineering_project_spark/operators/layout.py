"""Z-order data layout: multi-dimensional clustering for scan pruning.

SURVEY §2.2 Q18 family (sinks / physical layout). The reference loads
flat CSV into Redshift and lets the warehouse sort (`README.md:21`); a
100 TB parquet lake has to own its layout instead, because row-group
min/max skipping is the difference between scanning a file and scanning
a petabyte. A single-column sort prunes one predicate dimension and
destroys the others; interleaving the bits of two quantized sort keys
(the Z-order / Morton curve) keeps BOTH dimensions locally clustered,
so a box predicate on (user, value) skips row groups on either — the
technique Delta/Iceberg expose as ``OPTIMIZE ... ZORDER BY``.

Everything here is closed-form integer arithmetic — quantization is
``((x - min) * 2^bits) div (max - min + 1)`` and the interleave is
shift/mask sums — so the layout key itself is oracle-checkable in plain
SQL, and the *physical* skipping claim is proven mechanically in
``tests/test_zorder_layout.py`` by reading parquet footer statistics of
a z-ordered vs a linearly-sorted write of the same rows.

Scale (100 TB design point): computing the key is a narrow codegen
projection (two broadcast scalars for min/max, zero extra shuffle
beyond the ``repartitionByRange`` that any clustered write already
pays). Range-partitioning by z-value gives each output file a compact
z-interval, i.e. a small rectangle footprint in (dim1, dim2) space —
file count and file size stay operator-chosen, unrelated to corpus
size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from ..registry import register
from ..tables import table

ZBITS = 8  # 256 quantization levels per dimension -> 16-bit z-value


def _quantize(x: str, lo: str, hi: str, bits: int = ZBITS) -> Column:
    """Map integral column ``x`` in ``[lo, hi]`` onto ``0 .. 2^bits - 1``.

    Pure integer arithmetic (``div``, not ``/``) so Spark and any SQL
    oracle produce bit-identical keys; the ``+ 1`` denominator keeps the
    top of the range at ``2^bits - 1`` without a clamp.
    """
    return F.expr(f"(({x} - {lo}) * {1 << bits}) div ({hi} - {lo} + 1)")


def zvalue(qa: Column, qb: Column, bits: int = ZBITS) -> Column:
    """Interleave two ``bits``-wide quantized keys into a Morton code.

    Bit ``j`` of ``qa`` lands at position ``2j``, of ``qb`` at ``2j+1``
    — a shift/mask sum that stays inside whole-stage codegen.
    """
    z = F.lit(0).cast("long")
    for j in range(bits):
        z = z + F.shiftleft(F.shiftright(qa, j).bitwiseAND(F.lit(1)), 2 * j)
        z = z + F.shiftleft(
            F.shiftright(qb, j).bitwiseAND(F.lit(1)), 2 * j + 1
        )
    return z


def zorder_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events with their (user_id, value)-space Morton key attached."""
    ev = table(spark, sf_dir, "events")
    with_cents = ev.select(
        "event_id",
        "user_id",
        F.col("value"),
        F.round(F.col("value") * 100).cast("long").alias("v_cents"),
    )
    stats = with_cents.agg(
        F.min("user_id").alias("min_u"),
        F.max("user_id").alias("max_u"),
        F.min("v_cents").alias("min_c"),
        F.max("v_cents").alias("max_c"),
    )
    keyed = with_cents.crossJoin(F.broadcast(stats)).select(
        "event_id",
        "user_id",
        "value",
        _quantize("user_id", "min_u", "max_u").alias("z_x"),
        _quantize("v_cents", "min_c", "max_c").alias("z_y"),
    )
    return keyed.select(
        "event_id",
        "user_id",
        "value",
        "z_x",
        "z_y",
        zvalue(F.col("z_x"), F.col("z_y")).alias("zval"),
    )


def zorder_write(
    df: DataFrame, path: str, zcol: str = "zval", files: int = 16
) -> None:
    """Write ``df`` range-partitioned and sorted by its z-key.

    Each output file covers one compact z-interval — a bounded rectangle
    footprint in the original dimensions, which is exactly what footer
    min/max skipping needs. ``files`` is the layout-granularity knob
    (at 100 TB: pick from target file size, not row count).
    """
    (
        df.repartitionByRange(files, F.col(zcol))
        .sortWithinPartitions(zcol)
        .write.mode("overwrite")
        .parquet(path)
    )


def _interleave_sql(qa: str, qb: str, bits: int = ZBITS) -> str:
    terms = []
    for j in range(bits):
        terms.append(f"((({qa} >> {j}) & 1) * {1 << (2 * j)})")
        terms.append(f"((({qb} >> {j}) & 1) * {1 << (2 * j + 1)})")
    return " + ".join(terms)


@register(
    "q18_zorder_key",
    oracle=f"""
    WITH cents AS (
        SELECT event_id, user_id, value,
               CAST(round(value * 100) AS BIGINT) AS v_cents
        FROM events
    ),
    stats AS (
        SELECT min(user_id) AS min_u, max(user_id) AS max_u,
               min(v_cents) AS min_c, max(v_cents) AS max_c
        FROM cents
    ),
    keyed AS (
        SELECT event_id, user_id, value,
               ((user_id - min_u) * {1 << ZBITS}) // (max_u - min_u + 1)
                   AS z_x,
               ((v_cents - min_c) * {1 << ZBITS}) // (max_c - min_c + 1)
                   AS z_y
        FROM cents, stats
    )
    SELECT event_id, user_id, value, z_x, z_y,
           {_interleave_sql("z_x", "z_y")} AS zval
    FROM keyed
    """,
    tags=("sinks", "layout", "Q18"),
)
def q18_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18c: the Z-order clustering key, oracle-checked bit-for-bit.

    The physical skipping payoff of writing with this key is asserted
    separately against parquet footer stats in
    ``tests/test_zorder_layout.py`` (a layout cannot be hash-compared
    through a row-level oracle; its KEY can, and is, here).
    """
    return zorder_events(spark, sf_dir)
