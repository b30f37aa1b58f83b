"""Mergeable cardinality sketches: the incremental-analytics companion to
the fingerprint stores.

``approx_count_distinct`` answers "how many distinct NOW" but cannot be
updated — a daily 100 TB crawl would re-scan history to refresh a
distinct-URL count.  Datasketches HLL sketches (Spark 3.5+ built-ins:
``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate``) are
MERGEABLE: keep one small binary sketch per group as the carried state,
union each new batch's sketches in, estimate on read.  Error is the
standard HLL ±~1.6% at lgConfigK=12 (tunable), the store is O(#groups ·
2^lgK bytes), and merging N batch sketches is associative/commutative —
any merge order lands within the sketch's error bar of the one-shot
sketch over the union, and identical merge sequences are bit-stable
(both tested; exact bit-equality across DIFFERENT merge shapes is not an
HLL guarantee — the union gadget swaps the HIP estimator for the
composite one).

Store contract (mirrors the dedup fingerprint stores): a plain DataFrame
``(group_cols…, sketch binary)`` — persistable with write_bucketed_store,
readable by any Spark job, no driver state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hll_store(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lgk: int = 12,
    sketch_col: str = "sketch",
) -> DataFrame:
    """One HLL sketch of ``value_col`` per group — a batch's summary.
    NULL values are ignored by the sketch (match count-distinct
    semantics)."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lgk)).alias(sketch_col)
    )


def hll_merge_stores(
    stores: list[DataFrame],
    group_cols: list[str],
    sketch_col: str = "sketch",
) -> DataFrame:
    """Union N stores (e.g. yesterday's store + today's batch) into one:
    groups present in several stores merge their sketches; groups in one
    store pass through.  ONE shuffle on the group key."""
    if not stores:
        raise ValueError("need at least one store")
    unioned = stores[0]
    for s in stores[1:]:
        unioned = unioned.unionByName(s)
    return unioned.groupBy(*group_cols).agg(
        F.hll_union_agg(F.col(sketch_col)).alias(sketch_col)
    )


def hll_estimates(
    store: DataFrame,
    sketch_col: str = "sketch",
    out_col: str = "approx_distinct",
) -> DataFrame:
    """Read side: the store with its cardinality estimates (narrow)."""
    return store.withColumn(
        out_col, F.hll_sketch_estimate(F.col(sketch_col))
    )


def incremental_distinct_count(
    prev_store: DataFrame | None,
    batch: DataFrame,
    group_cols: list[str],
    value_col: str,
    lgk: int = 12,
    sketch_col: str = "sketch",
) -> DataFrame:
    """The refresh step: fold a new batch into the carried store.

    First run (``prev_store=None``) just sketches the batch.  Re-ingesting
    the same values cannot inflate the REGISTERS (HLL takes maxima), so a
    re-crawled URL never grows the distinct count materially — the
    property exact counters lose the moment data re-arrives.  Precisely:
    the first union switches datasketches' estimator from HIP to the
    composite one (a ~1% one-time shift, inside the sketch's error bar);
    after that, re-ingesting the same values is bit-stable (tested).
    """
    fresh = hll_store(batch, group_cols, value_col, lgk, sketch_col)
    if prev_store is None:
        return fresh
    return hll_merge_stores([prev_store, fresh], group_cols, sketch_col)
