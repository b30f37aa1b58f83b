"""Local stand-in for the driver's correctness gate.

Runs every catalog query through Spark AND its DuckDB oracle at a given scale
factor, canonicalizes both results (sort columns by name, stringify values,
sort rows), and reports row-count/schema/value mismatches with a sample diff.

Usage:  python tools/verify_local.py [--vanilla] [sf_dir] [query ...]

``--vanilla`` builds a bare SparkSession exactly like the correctness driver
does (no session-factory confs) and additionally fails any query whose result
schema contains array/map/struct columns — the driver's pandas canonicalizer
cannot sort those (round-1 failure mode for q18/q19).
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from evidence_datasource_parsers_spark.forensics import (  # noqa: E402
    TABLES,
    canon_rows,
)


def run(sf_dir: str, only: list[str], vanilla: bool = False) -> int:
    import duckdb

    from __spark_entry__ import oracle_sql, queries

    if vanilla:
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .appName("verify-vanilla")
            .getOrCreate()
        )
    else:
        from evidence_datasource_parsers_spark.session import get_spark

        spark = get_spark("verify-local")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs, oracles = queries(), oracle_sql()
    names = only or list(qs)
    failures = 0
    for name in names:
        try:
            sdf = qs[name](spark, sf_dir)
            s_cols = sdf.columns
            if vanilla:
                bad = [
                    f"{f.name}:{f.dataType.simpleString()}"
                    for f in sdf.schema.fields
                    if f.dataType.typeName() in ("array", "map", "struct")
                ]
                if bad:
                    print(f"FAIL  {name}: driver-unsortable columns {bad}")
                    failures += 1
                    continue
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {exc}")
            failures += 1
            continue
        if name not in oracles:
            print(f"OK?   {name}: rows={len(s_rows)} (no oracle — rows-only)")
            continue
        try:
            rel = con.sql(oracles[name])
            d_cols = list(rel.columns)
            d_rows = rel.fetchall()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: oracle error: {exc}")
            failures += 1
            continue
        sc, sr = canon_rows(s_cols, s_rows)
        dc, dr = canon_rows(d_cols, d_rows)
        if sc != dc:
            print(f"FAIL  {name}: schema {sc} vs oracle {dc}")
            failures += 1
            continue
        if len(sr) != len(dr):
            print(f"FAIL  {name}: rowcount {len(sr)} vs oracle {len(dr)}")
            failures += 1
            continue
        if sr != dr:
            diffs = [(a, b) for a, b in zip(sr, dr) if a != b][:3]
            print(f"FAIL  {name}: value mismatch; first diffs: {diffs}")
            failures += 1
            continue
        print(f"OK    {name}: rows={len(sr)}")
    print(f"\n{len(names) - failures}/{len(names)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    args = sys.argv[1:]
    vanilla = "--vanilla" in args
    args = [a for a in args if a != "--vanilla"]
    sf = args[0] if args and "/" in args[0] else "/root/testdata/sf0.01"
    only = args[1:] if args and "/" in args[0] else args
    raise SystemExit(run(sf, only, vanilla=vanilla))
