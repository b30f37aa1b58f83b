"""CachedEnricher (D9/D10) and Runner (M1-M3) tests."""

from __future__ import annotations

import gzip
import json

import pytest

from evidence_datasource_parsers_spark.enrich import CachedEnricher
from evidence_datasource_parsers_spark.runner import (
    Runner,
    SchemaContractError,
)


def _lookup(parts):
    disease, disease_id = parts
    if disease == "marfan":
        return [{"mapped": "EFO:1"}, {"mapped": "EFO:2"}]  # 1:N fan-out
    if disease is None:
        return []  # no mapping
    return [{"mapped": f"EFO:{disease}"}]


def test_cached_enricher_fanout_and_cache(spark, tmp_path):
    cache = str(tmp_path / "lut.json")
    ev = spark.createDataFrame(
        [("marfan", "OMIM:1"), ("gout", "OMIM:2"), (None, None),
         ("marfan", "OMIM:1")],
        "disease string, disease_id string",
    )
    enricher = CachedEnricher(_lookup, ["mapped"], cache)
    out = enricher(ev, ["disease", "disease_id"]).collect()
    mapped = sorted(r["mapped"] or "-" for r in out)
    # marfan rows fan out ×2 each (2 rows × 2 mappings), gout 1, null-key 1
    assert mapped == ["-", "EFO:1", "EFO:1", "EFO:2", "EFO:2", "EFO:gout"]
    assert enricher.calls == 3  # distinct keys only

    # second run with a fresh enricher: cache hit → zero external calls
    enricher2 = CachedEnricher(_lookup, ["mapped"], cache)
    enricher2(ev, ["disease", "disease_id"]).collect()
    assert enricher2.calls == 0


def test_runner_dag_schema_and_sink(spark, tmp_path):
    r = Runner()
    r.register(
        "base",
        lambda s, cfg: s.createDataFrame(
            [(cfg["gene"], 0.5)], "targetFromSourceId string, resourceScore double"
        ),
        output_schema="targetFromSourceId string, resourceScore double",
    )
    r.register(
        "dependent",
        lambda s, cfg: s.createDataFrame(
            [("ok",)], "status string"
        ),
        output_schema="status string",
        depends_on=("base",),
    )
    out_dir = str(tmp_path)
    results = r.run(spark, {"gene": "TP53"}, out_dir=out_dir)
    assert set(results) == {"base", "dependent"}
    with gzip.open(f"{out_dir}/base.json.gz", "rt") as fh:
        assert json.loads(fh.readline())["targetFromSourceId"] == "TP53"


def test_runner_schema_contract_violation(spark):
    r = Runner()
    r.register(
        "bad",
        lambda s, cfg: s.createDataFrame([(1,)], "wrong_name int"),
        output_schema="right_name int",
    )
    with pytest.raises(SchemaContractError, match="schema mismatch"):
        r.run(spark, {})


def test_runner_cycle_detection(spark):
    r = Runner()
    r.register("a", lambda s, c: None, depends_on=("b",))
    r.register("b", lambda s, c: None, depends_on=("a",))
    with pytest.raises(ValueError, match="cycle"):
        r.run(spark, {})
