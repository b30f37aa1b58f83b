"""Meta-tests over the catalog itself: every entry honors the contract the
driver and the judge rely on."""

from __future__ import annotations

import re

from evidence_datasource_parsers_spark.plans import CATALOG

KNOWN_TABLES = {
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
}


def test_every_query_has_docstring_and_tags():
    for name, q in CATALOG.items():
        assert q.builder.__doc__, f"{name} missing docstring"
        assert q.tags, f"{name} missing tags"


def test_oracles_reference_only_registered_views():
    """Oracle SQL may only use the views the driver pre-registers."""
    for name, q in CATALOG.items():
        if q.oracle is None:
            continue
        for m in re.finditer(r"\b(?:FROM|JOIN)\s+([a-z_][a-z0-9_]*)", q.oracle):
            t = m.group(1)
            # CTE names and subquery aliases are fine; real tables must be known
            if t in KNOWN_TABLES:
                continue
            assert t not in {"parquet", "read_parquet"}, (
                f"{name}: oracle reads files directly ({t})"
            )


def test_rows_only_queries_are_documented_exceptions():
    """Only approximate/Python-kernel queries may omit the oracle."""
    no_oracle = {n for n, q in CATALOG.items() if q.oracle is None}
    assert no_oracle == {
        "q39_ann_lsh", "q49_approx_distinct", "q62_multimodal_meta"
    }, no_oracle


def test_bench_set_is_oracle_checked_or_rows_only():
    for name, q in CATALOG.items():
        if q.bench:
            assert q.oracle is not None or name in {"q39_ann_lsh"}, (
                f"benched query {name} must be correctness-gated"
            )


def test_catalog_size_monotonic_floor():
    """Coverage must not silently shrink between rounds."""
    assert len(CATALOG) >= 62
    assert sum(1 for q in CATALOG.values() if q.oracle) >= 59


def test_rerun_determinism(spark, sf_dir):
    """Two independent builds of hash/window queries must produce identical
    results — the foundation of consistent incremental dedup re-runs."""
    for name in ["q33_minhash_signature", "q28_sessionize", "q03_top_customer_per_nation"]:
        a = sorted(map(str, CATALOG[name].builder(spark, sf_dir).collect()))
        b = sorted(map(str, CATALOG[name].builder(spark, sf_dir).collect()))
        assert a == b, f"{name} not rerun-stable"
