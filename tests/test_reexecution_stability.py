"""Re-execution stability: building and collecting the state-heaviest
catalog queries TWICE in one session must produce identical values — the
query-level guard against the two-action / nondeterministic-lineage bug
class (persisted frames, iterative components, eager checkpoints, driver
actions inside builders)."""

from __future__ import annotations

import pytest

from evidence_datasource_parsers_spark.plans import CATALOG

# the queries whose builders persist, checkpoint, iterate, or run driver
# actions — exactly where re-execution could diverge
STATEFUL = [
    "q34_lsh_candidates",   # persisted fingerprints, incremental legs
    "q35_simhash",          # pinned store + winnow leg
    "q38_embedding_dupes",  # cached bucketing + connected components
    "q39_ann_topk",         # persisted corpus bucketing, 3 legs
    "q42_percentiles",      # sketch-store fold
    "q50_hash_split",       # LM training + vocab action + decimal sums
]


def _canon(df):
    cols = sorted(df.columns)
    return sorted(
        tuple(str(row[c]) for c in cols) for row in df.collect()
    )


@pytest.mark.parametrize("name", STATEFUL)
def test_rebuild_is_value_identical(spark, sf_dir, name):
    q = CATALOG[name]
    first = _canon(q.builder(spark, sf_dir))
    second = _canon(q.builder(spark, sf_dir))
    assert first == second and first
