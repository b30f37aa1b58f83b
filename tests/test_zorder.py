"""Z-order clustering: the pruning property (both dimensions get
locality; single-column sort does not), Morton-key correctness, null
placement, and argument guards."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from evidence_datasource_parsers_spark.operators.zorder import (
    morton_key,
    zorder_by,
)


def _grid(spark, n=32):
    rows = [(x, y) for x in range(n) for y in range(n)]
    return spark.createDataFrame(rows, "x int, y int")


def _overlap_fraction(df, col, lo, hi, n_parts):
    """Fraction of partitions whose [min,max] of `col` intersects [lo,hi]
    — a stand-in for parquet row-group min/max pruning."""
    stats = (
        df.withColumn("__pid", F.spark_partition_id())
        .groupBy("__pid")
        .agg(F.min(col).alias("mn"), F.max(col).alias("mx"))
        .collect()
    )
    assert len(stats) >= n_parts // 2  # sanity: data actually spread out
    hit = sum(1 for r in stats if r.mn <= hi and r.mx >= lo)
    return hit / len(stats)


def test_morton_key_interleaves(spark):
    df = spark.createDataFrame([(0b101, 0b011)], "a int, b int")
    k = df.select(
        morton_key([F.col("a"), F.col("b")], bits=3).alias("k")
    ).first().k
    # a bits go to even positions, b bits to odd:
    # a=101 → bits 0,2 at positions 0,4 ; b=011 → bits 0,1 at positions 1,3
    assert k == (1 << 0) | (1 << 4) | (1 << 1) | (1 << 3)


def test_zorder_prunes_both_dimensions(spark):
    df = _grid(spark)
    n_parts = 16
    z = zorder_by(df, ["x", "y"], bits=5, num_partitions=n_parts)

    zx = _overlap_fraction(z, "x", 3, 5, n_parts)
    zy = _overlap_fraction(z, "y", 3, 5, n_parts)
    # single-column layout: perfect on x, hopeless on y
    xsorted = df.repartitionByRange(n_parts, "x").sortWithinPartitions("x")
    sx = _overlap_fraction(xsorted, "x", 3, 5, n_parts)
    sy = _overlap_fraction(xsorted, "y", 3, 5, n_parts)

    assert sy == 1.0            # the failure mode z-order fixes
    assert zx <= 0.5 and zy <= 0.5  # both dims prune under z-order
    assert sx <= zx             # x-only sort is still best for x alone


def test_rows_preserved_and_nulls_first_tile(spark):
    df = spark.createDataFrame(
        [(None, 1), (5, None), (3, 4), (9, 9)], "x int, y int"
    )
    z = zorder_by(df, ["x", "y"], bits=4, num_partitions=2, key_col="zk")
    rows = z.collect()
    assert len(rows) == 4
    by_key = sorted(rows, key=lambda r: r.zk)
    assert by_key[0].x is None or by_key[0].y is None  # nulls tile lowest


def test_guards(spark):
    df = _grid(spark, 4)
    with pytest.raises(ValueError, match="63-bit"):
        zorder_by(df, ["x", "y"], bits=32)
    with pytest.raises(ValueError, match="at least one"):
        zorder_by(df, [], bits=8)


def test_string_and_timestamp_axes(spark):
    import datetime

    base = datetime.datetime(2024, 1, 1)
    rows = [
        (f"dom{i % 4}", base + datetime.timedelta(hours=i), i)
        for i in range(64)
    ]
    df = spark.createDataFrame(rows, "domain string, ts timestamp, v int")
    z = zorder_by(df, ["domain", "ts"], bits=4, num_partitions=4,
                  key_col="zk")
    got = z.collect()
    assert len(got) == 64
    # equal domains share tiles: rows of one domain span FEW partitions
    from pyspark.sql import functions as F2
    spread = (
        z.withColumn("pid", F2.spark_partition_id())
        .groupBy("domain")
        .agg(F2.countDistinct("pid").alias("np"))
        .collect()
    )
    assert max(r.np for r in spread) <= 3  # never smeared across all 4
