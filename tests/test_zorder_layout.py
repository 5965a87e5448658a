"""Z-order layout: prove the row-group-skipping claim from parquet footers.

The oracle checks the Morton KEY is computed right
(``q18_zorder_key``); this test checks the key BUYS something — that a
z-ordered write yields per-file min/max envelopes a scan planner can
actually skip with, on BOTH dimensions, where a single-column sort only
prunes its own column. Footer statistics are read with pyarrow, i.e.
the same metadata any engine's scan pruning consults, so the assertion
is about the physical artifact, not about one engine's metrics.
"""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from reddit_data_engineering_project_spark.operators.layout import (
    zorder_events,
    zorder_write,
)

SF_DIR = "/root/testdata/sf0.01"
FILES = 16


def _envelopes(path: str, col_a: str, col_b: str):
    """Per-file (min, max) of both predicate columns, from footers only."""
    out = []
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        md = pq.ParquetFile(f).metadata
        names = {
            md.row_group(0).column(i).path_in_schema: i
            for i in range(md.row_group(0).num_columns)
        }
        lo_a = hi_a = lo_b = hi_b = None
        for rg in range(md.num_row_groups):
            sa = md.row_group(rg).column(names[col_a]).statistics
            sb = md.row_group(rg).column(names[col_b]).statistics
            lo_a = sa.min if lo_a is None else min(lo_a, sa.min)
            hi_a = sa.max if hi_a is None else max(hi_a, sa.max)
            lo_b = sb.min if lo_b is None else min(lo_b, sb.min)
            hi_b = sb.max if hi_b is None else max(hi_b, sb.max)
        out.append(((lo_a, hi_a), (lo_b, hi_b)))
    return out


def _files_hit(envs, dim: int, lo, hi) -> int:
    """Files whose [min,max] envelope on dimension ``dim`` meets [lo,hi]."""
    return sum(1 for env in envs if env[dim][0] <= hi and env[dim][1] >= lo)


def test_zorder_skips_on_both_dimensions(spark, tmp_path):
    keyed = zorder_events(spark, SF_DIR)

    zpath = str(tmp_path / "events_zorder")
    lpath = str(tmp_path / "events_linear")
    zorder_write(keyed, zpath, files=FILES)
    # The strawman a z-order must beat: the same rows, same file count,
    # clustered by ONE dimension only.
    (
        keyed.repartitionByRange(FILES, F.col("user_id"))
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .parquet(lpath)
    )

    zenv = _envelopes(zpath, "user_id", "value")
    lenv = _envelopes(lpath, "user_id", "value")
    assert len(zenv) == len(lenv) == FILES

    # Box predicate selective in each dimension: ~10% of each range.
    users = (0, 14)
    values = (100.0, 140.0)

    # Linear layout: perfect on its sort column, useless on the other —
    # every file spans (essentially) the full value range.
    assert _files_hit(lenv, 0, *users) <= 3
    assert _files_hit(lenv, 1, *values) == FILES

    # Z-order: BOTH single-dimension predicates skip most files. With
    # 8-bit quantization and 16 z-range files, a 10% slab touches the
    # files whose z-interval crosses it — bounded by the curve's
    # locality, far below "all of them".
    z_user_hits = _files_hit(zenv, 0, *users)
    z_value_hits = _files_hit(zenv, 1, *values)
    assert z_user_hits <= FILES // 2, zenv
    assert z_value_hits <= FILES // 2, zenv

    # And the 2-D box (what the layout is FOR) intersects both envelopes
    # in strictly fewer files than either layout's worst dimension.
    z_box = sum(
        1
        for env in zenv
        if env[0][0] <= users[1]
        and env[0][1] >= users[0]
        and env[1][0] <= values[1]
        and env[1][1] >= values[0]
    )
    l_box = sum(
        1
        for env in lenv
        if env[0][0] <= users[1]
        and env[0][1] >= users[0]
        and env[1][0] <= values[1]
        and env[1][1] >= values[0]
    )
    assert z_box < l_box or (z_box <= 4 and l_box <= 4), (z_box, l_box)

    # Round-trip integrity: layout changed, rows did not.
    assert (
        spark.read.parquet(zpath).count()
        == spark.read.parquet(lpath).count()
        == keyed.count()
    )
