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
    # One DISCARDED pass at the bench SF before any timing (VERDICT r11):
    # the first full-scale run absorbs one-time costs the per-query samples
    # should not see — input file listing, OS page-cache population, and
    # remaining JIT tiers — which otherwise land entirely in query #1's
    # first sample and skew round-over-round comparison on a shared host.
    for name in names:
        try:
            spark.catalog.clearCache()
            materialize(CATALOG[name].builder(spark, sf_dir))
        except Exception:
            pass  # the timed loop reports the failure with its message

    # min of N timed runs per query: the host is shared, and a single sample
    # can absorb seconds of neighbor load (observed ~2× per-query swing
    # between back-to-back runs); the minimum measures the engine.  Hot
    # queries (min > 0.5s) get 5 samples instead of 3, and every sample plus
    # the relative spread is recorded — round 5's min-of-3 produced phantom
    # +64%/+71% round-over-round "regressions" in unchanged code that an
    # in-file spread record would have adjudicated without re-measurement.
    from statistics import median

    timings: dict[str, float] = {}
    medians: dict[str, float] = {}
    samples: dict[str, list[float]] = {}
    spread: dict[str, float] = {}
    for name in names:
        runs: list[float] = []
        try:
            while len(runs) < (3 if not runs or min(runs) <= 0.5 else 5):
                # drop persisted blocks so every run is cold — CacheManager
                # matches identical plans, and a query that persists inside
                # (e.g. the LSH signature pin) would otherwise time its own
                # first run's cache on the second pass
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                materialize(CATALOG[name].builder(spark, sf_dir))
                runs.append(time.perf_counter() - t0)
            timings[name] = round(min(runs), 3)
            # median alongside min (VERDICT r11): min measures the engine
            # on a quiet host, median is robust to one noisy neighbor
            # sample — reading BOTH makes round-over-round deltas
            # adjudicable without re-measurement
            medians[name] = round(median(runs), 3)
            samples[name] = [round(r, 3) for r in runs]
            # relative spread: (max-min)/min — >0.5 flags a noisy sample set
            spread[name] = round((max(runs) - min(runs)) / min(runs), 3)
        except Exception as exc:  # one broken query must not kill the line
            print(f"bench: {name} failed: {exc}", file=sys.stderr)
            timings[name] = -1.0
            medians[name] = -1.0
            samples[name] = [round(r, 3) for r in runs]
            spread[name] = -1.0

    # failed queries (-1.0 sentinel) must not subtract from the headline
    # total — the metric stays monotone in real work done
    failed = sorted(n for n, t in timings.items() if t < 0)
    # The headline stdout line must stay SHORT: the round-over-round
    # comparator stores only a 2000-char tail of stdout, and the r11-mandated
    # samples/spread arrays pushed the r12 line past that boundary — r13's
    # comparison came back empty because the stored r12 line was truncated
    # mid-JSON.  The per-sample detail (still required for adjudicating noisy
    # deltas) goes to stderr and to a BENCH_SAMPLES.json sidecar instead.
    detail = {"samples": samples, "spread": spread}
    print("bench samples: " + json.dumps(detail), file=sys.stderr)
    try:
        sidecar = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "BENCH_SAMPLES.json"
        )
        with open(sidecar, "w") as fh:
            json.dump(detail, fh, indent=1)
    except OSError as exc:  # a read-only checkout must not kill the line
        print(f"bench: sidecar write failed: {exc}", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "catalog_headline_total",
                "value": round(sum(t for t in timings.values() if t >= 0), 3),
                "unit": "sec",
                "queries": timings,
                "medians": medians,
                "value_median": round(
                    sum(t for t in medians.values() if t >= 0), 3
                ),
                "failed": failed,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
