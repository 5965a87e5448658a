"""Physical-plan audit across every registered query.

Dumps each query's formatted physical plan and flags anti-patterns:

- CartesianProduct anywhere (always a bug in this engine; the one
  legitimate tiny-broadcast nested loop is BroadcastNestedLoopJoin).
- Python row-UDFs (``BatchEvalPython``) — only Arrow paths
  (``ArrowEvalPython`` / ``MapInPandas`` / ``FlatMapGroupsInPandas``)
  are sanctioned.
- Parquet scans that read every column of a wide table (pruning miss).
- Exchange (shuffle) counts per query, for eyeballing regressions.

Usage: python tools/audit_plans.py [--sf DIR] [--dump plans.txt]
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WIDE_TABLES = {"lineitem": 11, "orders": 6, "events": 6}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--dump", default=None)
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from reddit_data_engineering_project_spark import registry
    from reddit_data_engineering_project_spark.session import get_spark

    spark = get_spark(app_name="audit_plans", master="local[4]")
    queries = entrymod.queries()

    dump = open(args.dump, "w") if args.dump else None
    problems: list[str] = []
    for name in sorted(queries):
        df = queries[name](spark, args.sf)
        plan = spark._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        if dump:
            dump.write(f"{'=' * 70}\n{name}\n{plan}\n")
        n_exchange = len(re.findall(r"\bExchange\b", plan))
        flags = []
        if "CartesianProduct" in plan:
            flags.append("CARTESIAN")
        # Row-pickling scalar Python UDFs are banned. UDTF nodes
        # (BatchEvalPythonUDTF) are row-Python by the API's nature and
        # allowed ONLY for queries explicitly registered with the "udtf"
        # tag (the declared table-function surface, kept off hot paths).
        scalar_row_udf = re.sub(r"BatchEvalPythonUDTF", "", plan)
        if "BatchEvalPython" in scalar_row_udf:
            flags.append("ROW_PYTHON_UDF")
        elif "BatchEvalPythonUDTF" in plan and "udtf" not in registry.TAGS.get(
            name, ()
        ):
            flags.append("UNDECLARED_UDTF")
        for scan in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
            ncols = len(scan.group(1).split(",")) if scan.group(1) else 0
            if ncols >= 10:
                flags.append(f"WIDE_SCAN({ncols}cols)")
        status = ",".join(flags) if flags else "ok"
        print(f"{name:38s} exchanges={n_exchange:2d}  {status}")
        if flags:
            problems.append(f"{name}: {','.join(flags)}")
    if dump:
        dump.close()
    print(f"\n{len(problems)} flagged" + (": " + "; ".join(problems) if problems else ""))
    spark.stop()
    return 1 if problems else 0


if __name__ == "__main__":
    sys.exit(main())
