"""MMR selection: diversification beats pure relevance on a planted
near-dup, λ=1 reduces to top-k, determinism, guards, and the >8-round
lineage-cut path."""

from __future__ import annotations

import math

import pytest

from evidence_datasource_parsers_spark.operators.mmr import (
    mmr_select,
    mmr_select_ids,
)

DIM = 4


def _unit(v):
    n = math.sqrt(sum(x * x for x in v))
    return [x / n for x in v]


@pytest.fixture()
def cands(spark):
    rows = [
        # two near-identical top scorers pointing along +x
        (1, 1.00, _unit([1.0, 0.01, 0, 0])),
        (2, 0.99, _unit([1.0, 0.02, 0, 0])),
        # a moderately relevant but orthogonal doc
        (3, 0.70, _unit([0, 1.0, 0, 0])),
        (4, 0.10, _unit([0, 0, 1.0, 0])),
    ]
    return spark.createDataFrame(rows, "doc_id long, score double, "
                                       "embedding array<double>")


def test_diversifies_past_near_dup(cands):
    # relevance-only: [1, 2]; MMR at λ=0.5: the near-dup of 1 is ~fully
    # penalized, so the orthogonal doc 3 wins slot 2
    assert mmr_select_ids(cands, 2, lambda_=0.5) == [1, 3]


def test_lambda_one_is_plain_topk(cands):
    assert mmr_select_ids(cands, 3, lambda_=1.0) == [1, 2, 3]


def test_pick_order_and_exhaustion(cands):
    got = mmr_select(cands, 10, lambda_=0.5)
    assert len(got) == 4  # stops when candidates run out
    assert [r.doc_id for r in got][0] == 1


def test_deterministic(cands):
    a = mmr_select_ids(cands, 4, lambda_=0.3)
    b = mmr_select_ids(cands, 4, lambda_=0.3)
    assert a == b


def test_many_rounds_lineage_cut(spark):
    rows = [(i, 1.0 / (i + 1), _unit([1.0, float(i), 0, 0]))
            for i in range(24)]
    df = spark.createDataFrame(rows, "doc_id long, score double, "
                                     "embedding array<double>")
    got = mmr_select_ids(df, 20, lambda_=0.6)
    assert len(got) == 20 and len(set(got)) == 20


def test_guards(cands):
    with pytest.raises(ValueError, match="lambda_"):
        mmr_select(cands, 2, lambda_=1.5)
    with pytest.raises(ValueError, match="k"):
        mmr_select(cands, 0)
