"""HLL sketch stores: merge-order invariance, incremental ≡ one-shot,
re-ingest idempotence, accuracy, parquet persistence of the binary."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from evidence_datasource_parsers_spark.operators.sketches import (
    hll_estimates,
    hll_merge_stores,
    hll_store,
    incremental_distinct_count,
)


def _batch(spark, dom, lo, hi):
    return spark.createDataFrame(
        [(dom, f"url{u}") for u in range(lo, hi)], "domain string, url string"
    )


def _est(store):
    return {
        r.domain: r.approx_distinct for r in hll_estimates(store).collect()
    }


def test_accuracy_and_groups(spark):
    df = _batch(spark, "a", 0, 1000).union(_batch(spark, "b", 0, 50))
    est = _est(hll_store(df, ["domain"], "url"))
    assert est["a"] == pytest.approx(1000, rel=0.05)
    assert est["b"] == pytest.approx(50, rel=0.05)


def test_incremental_equals_one_shot_and_merge_order(spark):
    b1 = _batch(spark, "a", 0, 400)
    b2 = _batch(spark, "a", 300, 700)   # overlaps b1
    b3 = _batch(spark, "a", 650, 900).union(_batch(spark, "b", 0, 10))

    store = None
    for b in (b1, b2, b3):
        store = incremental_distinct_count(store, b, ["domain"], "url")
    inc = _est(store)

    # merging batch sketches estimates the union within HLL error (the
    # union gadget's register coercion makes it near- but not bit-equal
    # to the one-shot sketch)
    one_shot = _est(hll_store(b1.union(b2).union(b3), ["domain"], "url"))
    for k in one_shot:
        assert inc[k] == pytest.approx(one_shot[k], rel=0.02)

    reordered = _est(
        hll_merge_stores(
            [hll_store(b, ["domain"], "url") for b in (b3, b1, b2)],
            ["domain"],
        )
    )
    for k in one_shot:
        assert reordered[k] == pytest.approx(one_shot[k], rel=0.02)

    # determinism: the same incremental fold re-run is bit-identical
    store2 = None
    for b in (b1, b2, b3):
        store2 = incremental_distinct_count(store2, b, ["domain"], "url")
    assert _est(store2) == inc


def test_reingest_is_idempotent(spark):
    """Re-ingesting identical values cannot inflate the registers; the
    first union switches the estimator (HIP → composite, ~1% shift), after
    which further re-ingests are bit-stable."""
    b = _batch(spark, "a", 0, 500)
    once = incremental_distinct_count(None, b, ["domain"], "url")
    twice = incremental_distinct_count(once, b, ["domain"], "url")
    thrice = incremental_distinct_count(twice, b, ["domain"], "url")
    assert _est(twice)["a"] == pytest.approx(_est(once)["a"], rel=0.02)
    assert _est(thrice) == _est(twice)


def test_store_survives_parquet_roundtrip(spark, tmp_path):
    b = _batch(spark, "a", 0, 300)
    store = hll_store(b, ["domain"], "url")
    path = str(tmp_path / "hll_store")
    store.write.mode("overwrite").parquet(path)
    loaded = spark.read.parquet(path)
    merged = incremental_distinct_count(
        loaded, _batch(spark, "a", 250, 600), ["domain"], "url"
    )
    assert _est(merged)["a"] == pytest.approx(600, rel=0.05)


def test_empty_store_list_raises(spark):
    with pytest.raises(ValueError, match="at least one"):
        hll_merge_stores([], ["domain"])
