"""Z-order (Morton) clustering — multi-column data layout for scan pruning.

A table sorted by ONE column prunes parquet row groups on that column
only; filters on any other column read everything.  Interleaving the bits
of several columns' ranks into one Morton key and range-partitioning by
it gives every participating column locality, so min/max (and partition)
pruning works for filters on ANY of them — the technique behind Delta's
OPTIMIZE ZORDER and equivalent lakehouse clustering.

Pipeline (all in-plan, no driver collect):

    1. per column: ~equi-depth bin edges from ONE percentile_approx
       aggregate, broadcast back (the F7 scalar pattern)
    2. per row: bin index = #edges below the value (narrow array scan) —
       rank-based, so skew and outliers cannot collapse the key space
    3. Morton key: bit-interleave the bin indices (unrolled shift/or
       expressions, whole-stage-codegen'd)
    4. repartitionByRange + sortWithinPartitions on the key — each output
       file covers a compact hyper-rectangle of the value space

NULLs bin to 0 (the lowest tile) so they cluster together rather than
scattering.  ``bits`` per column × #cols ≤ 63 keeps the key in a long;
8 bits (256 bins) per column is plenty — pruning granularity is files,
not rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bin_index(value: Column, edges: Column) -> Column:
    """#edges strictly below value — an int in [0, n_edges]; NULL → 0."""
    return F.coalesce(
        F.size(F.filter(edges, lambda e: e < value)), F.lit(0)
    )


def morton_key(bin_cols: list[Column], bits: int) -> Column:
    """Interleave ``bits`` low bits of each (already-binned) int column:
    column j contributes bit i to output position i·n_cols + j."""
    n = len(bin_cols)
    out = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(bin_cols):
            bit = F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1))
            out = out.bitwiseOR(F.shiftleft(bit, i * n + j))
    return out


def zorder_by(
    df: DataFrame,
    cols: list[str],
    bits: int = 8,
    num_partitions: int | None = None,
    key_col: str | None = None,
) -> DataFrame:
    """The z-ordered frame: rows range-partitioned and sorted by the
    Morton key of ``cols``.  Write the result with any sink and every
    file's min/max stats stay tight on ALL of ``cols``.

    ``key_col`` keeps the key as a named column for inspection/tests;
    default drops it.  Requires ``bits * len(cols) <= 63``.
    """
    if not cols:
        raise ValueError("need at least one column")
    if bits * len(cols) > 63:
        raise ValueError(
            f"bits*cols = {bits * len(cols)} exceeds the 63-bit long key"
        )
    dts = dict(df.dtypes)

    def _axis(c: str) -> Column:
        """Column as a double axis: numerics cast; timestamps/dates via
        epoch micros; strings via a 64-bit hash — equal values still share
        a tile (equality-filter pruning), they just lose RANGE order,
        which a string mostly lacks anyway."""
        dt = dts[c]
        if dt.startswith("timestamp") or dt == "date":
            return F.unix_micros(F.col(c).cast("timestamp")).cast("double")
        if dt in ("string", "binary"):
            return F.xxhash64(F.col(c)).cast("double")
        return F.col(c).cast("double")

    n_edges = (1 << bits) - 1
    qs = F.array(
        *[F.lit((i + 1) / (n_edges + 1)) for i in range(n_edges)]
    )
    edges = df.agg(
        *[
            F.percentile_approx(_axis(c), qs).alias(f"__edges_{c}")
            for c in cols
        ]
    )
    keyed = df.crossJoin(F.broadcast(edges))
    bins = [_bin_index(_axis(c), F.col(f"__edges_{c}")) for c in cols]
    key = key_col or "__z"
    keyed = keyed.withColumn(key, morton_key(bins, bits)).drop(
        *[f"__edges_{c}" for c in cols]
    )
    parts = num_partitions or keyed.sparkSession.conf.get(
        "spark.sql.shuffle.partitions"
    )
    out = keyed.repartitionByRange(int(parts), F.col(key)).sortWithinPartitions(
        key
    )
    return out if key_col else out.drop(key)
