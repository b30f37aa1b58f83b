"""Dump ``explain("formatted")`` for every catalog query to a directory.

Usage:  python tools/dump_plans.py <out_dir> [sf_dir] [query ...]

Writes ``<out_dir>/<query>.txt`` with the formatted physical plan — the
artifact the optimization rounds commit as ``plans/r13/<query>_before.txt`` /
``..._after.txt`` so plan-shape claims are checkable without running Spark.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    out_dir = sys.argv[1]
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    only = set(sys.argv[3:])
    os.makedirs(out_dir, exist_ok=True)

    from evidence_datasource_parsers_spark.plans import CATALOG
    from evidence_datasource_parsers_spark.session import get_spark

    spark = get_spark("dump_plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name, q in sorted(CATALOG.items()):
        if only and name not in only:
            continue
        try:
            df = q.builder(spark, sf)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001 — report, keep sweeping
            print(f"ERROR {name}: {str(e)[:200]}")
            continue
        with open(os.path.join(out_dir, f"{name}.txt"), "w") as fh:
            fh.write(txt)
        n_exch = txt.count("Exchange")
        joins = [
            j
            for j in (
                "BroadcastHashJoin",
                "SortMergeJoin",
                "ShuffledHashJoin",
                "BroadcastNestedLoopJoin",
                "CartesianProduct",
            )
            if j in txt
        ]
        print(f"ok {name}: Exchange={n_exch} joins={','.join(joins) or '-'}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
