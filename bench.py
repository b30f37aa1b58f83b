"""Benchmark harness: runs the headline catalog queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...},
"sf": ...}.

Each query is fully materialized via the ``noop`` DataSource-V2 sink —
``count()`` would let Catalyst prune projection work entirely (a map-only
query "benchmarked" with count() measures an empty scan).  Timings are
wall-clock per query after a shared warm-up of the session JVM.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from evidence_datasource_parsers_spark.plans import CATALOG  # noqa: E402
from evidence_datasource_parsers_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    def materialize(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    names = [n for n, q in CATALOG.items() if q.bench]
    # Per-query warm-up at the smallest scale (not timed): whole-stage codegen
    # compilation + JIT are one-time costs that amortize to zero at real data
    # sizes; timing them against sf0.1 would measure the compiler, not the
    # engine.
    for name in names:
        materialize(CATALOG[name].builder(spark, "/root/testdata/sf0.001"))

    timings: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        try:
            materialize(CATALOG[name].builder(spark, sf_dir))
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as exc:  # one broken query must not kill the line
            print(f"bench: {name} failed: {exc}", file=sys.stderr)
            timings[name] = -1.0

    # failed queries (-1.0 sentinel) must not subtract from the headline
    # total — the metric stays monotone in real work done
    failed = sorted(n for n, t in timings.items() if t < 0)
    print(
        json.dumps(
            {
                "metric": "catalog_headline_total",
                "value": round(sum(t for t in timings.values() if t >= 0), 3),
                "unit": "sec",
                "queries": timings,
                "failed": failed,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
