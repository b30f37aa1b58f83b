"""Sink operators K1-K2 (SURVEY §2.2).

The reference's output contract is ONE gzipped JSON-lines file per pipeline
(``common/evidence.py:66-80``): coalesce(1) → write → assert single part →
rename.  That deliberate anti-parallelism is kept *opt-in here*: at 100 TB the
default sink writes partitioned output and the single-file contract is only
applied to the (small) final evidence sets that need it.
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame


def write_evidence_strings(
    df: DataFrame, out_path: str, single_file: bool = True
) -> None:
    """Gzipped JSON-lines evidence sink (K1).

    single_file=True reproduces the reference contract exactly: one part file,
    renamed to *out_path*.  single_file=False keeps the write parallel and
    *out_path* becomes a directory of gzipped parts (the scale path).
    """
    tmp = out_path + ".spark-tmp" if single_file else out_path
    writer = df.coalesce(1) if single_file else df
    (
        writer.write.format("json")
        .mode("overwrite")
        .option("compression", "org.apache.hadoop.io.compress.GzipCodec")
        .save(tmp)
    )
    if single_file:
        parts = glob.glob(os.path.join(tmp, "part-*.json.gz"))
        assert len(parts) == 1, f"expected exactly 1 part file, got {parts}"
        shutil.move(parts[0], out_path)
        shutil.rmtree(tmp)


def write_output(df: DataFrame, out_path: str, fmt: str | None = None) -> None:
    """Generic extension-dispatched writer (K2), parity with
    ``modules/BrainCRISPR.py:310-317``."""
    fmt = fmt or ("parquet" if out_path.endswith(".parquet") else "json")
    df.write.mode("overwrite").format(fmt).save(out_path)


def write_partitioned(
    df: DataFrame,
    out_path: str,
    partition_by: list[str],
    fmt: str = "parquet",
    buckets: tuple[int, list[str], str] | None = None,
) -> None:
    """The 100 TB sink: hive-partitioned (and optionally bucketed) output.

    ``partition_by`` columns become directory partitions (partition pruning
    on read); ``buckets=(n, cols, table_name)`` additionally bucket-sorts so
    downstream joins/aggs on those columns are shuffle-free.  Bucketing
    requires a table (saveAsTable) — Spark's bucket metadata lives in the
    catalog, not the files.
    """
    if buckets is None:
        df.write.mode("overwrite").format(fmt).partitionBy(*partition_by).save(
            out_path
        )
    else:
        n, cols, table = buckets
        (
            df.write.mode("overwrite")
            .format(fmt)
            .partitionBy(*partition_by)
            .bucketBy(n, *cols)
            .sortBy(*cols)
            .option("path", out_path)
            .saveAsTable(table)
        )


def corpus_checksum(df: DataFrame) -> dict:
    """Order- and partitioning-insensitive content fingerprint of a frame:
    ``{rows, checksum}`` where checksum is the bitwise XOR of the portable
    60-bit hash of every row's JSON form, folded in ONE aggregation.

    XOR is commutative/associative, so the value is identical however the
    rows are partitioned, ordered, or recomputed — two corpora (or two
    runs) match iff their row multisets match (XOR cancels PAIRS of equal
    rows; for dedup-ed corpora rows are unique and this is exact multiset
    equality up to 60-bit collisions).  One narrow shuffle-free pass +
    a single-row reduce."""
    from pyspark.sql import functions as F

    from evidence_datasource_parsers_spark.functions.hashing import (
        portable_hash,
    )

    row = portable_hash(F.to_json(F.struct(*sorted(df.columns))))
    out = df.agg(
        F.count(F.lit(1)).alias("rows"),
        F.bit_xor(row).alias("checksum"),  # bit_xor aggregate: Spark >= 3.2
    ).collect()[0]
    return {"rows": out["rows"], "checksum": int(out["checksum"] or 0)}


def write_with_manifest(
    df: DataFrame,
    out_path: str,
    partition_by: list[str] | None = None,
    fmt: str = "parquet",
) -> dict:
    """Partitioned write + a ``_MANIFEST.json`` beside it recording row
    count, schema DDL, and the order-insensitive corpus checksum — the
    reproducibility contract of a training-data release: a re-run (or a
    migration to another cluster) produced the same dataset iff the
    manifests match."""
    import json

    # write + checksum are two actions over the same frame: persist around
    # them so the manifest describes the rows that were ACTUALLY written
    # even when the lineage is nondeterministic (same hazard the runner
    # guards for sink+validate)
    df.persist()
    try:
        write_partitioned(df, out_path, partition_by or [], fmt=fmt)
        manifest = {
            "format": fmt,
            "partition_by": partition_by or [],
            "schema": df.schema.simpleString(),
            **corpus_checksum(df),
        }
    finally:
        df.unpersist()
    with open(os.path.join(out_path, "_MANIFEST.json"), "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)
    return manifest
