"""Golden-fixture tests for the parser-pattern pipelines (FIXTURES.md shapes)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from evidence_datasource_parsers_spark.operators.expectations import (
    ExpectationError,
)
from evidence_datasource_parsers_spark.pipelines.encore_like import (
    encore_evidence,
    stouffer_combine,
)
from evidence_datasource_parsers_spark.pipelines.essentiality_like import (
    essentiality_evidence,
    melt_gene_matrix,
)
from evidence_datasource_parsers_spark.pipelines.gene_burden import (
    gene_burden_evidence,
    shape_binary_source,
    shape_quant_source,
)
from evidence_datasource_parsers_spark.pipelines.impc_like import (
    impc_evidence,
    mouse_phenotypes_dataset,
)
from evidence_datasource_parsers_spark.pipelines.slapenrich import (
    slapenrich_evidence,
)


def test_slapenrich_minimum_slice(spark):
    pathways = spark.createDataFrame(
        [
            ("BRCA", "TP53", "R-HSA-1: Apoptosis", 1e-6),
            ("BRCA", "EGFR", "R-HSA-2: Signaling", 0.5),  # filtered out
            ("LUAD", "KRAS", "R-HSA-3: RAS cycle", 1e-9),
            ("UNKN", "MYC", "R-HSA-4: Myc targets", 1e-9),  # no LUT match
        ],
        "ctype string, gene string, pathway string, SLAPEnrichPval double",
    )
    lut = spark.createDataFrame(
        [("BRCA", "EFO:0000305", "breast carcinoma"),
         ("LUAD", "EFO:0000571", "lung adenocarcinoma")],
        "Cancer_type_acronym string, EFO_id string, EFO_name string",
    )
    out = slapenrich_evidence(pathways, lut).collect()
    by_gene = {r["targetFromSourceId"]: r for r in out}
    assert set(by_gene) == {"TP53", "KRAS"}
    assert by_gene["TP53"]["diseaseFromSourceMappedId"] == "EFO:0000305"
    assert by_gene["TP53"]["pathways"][0]["id"] == "R-HSA-1"
    assert by_gene["TP53"]["pathways"][0]["name"] == "Apoptosis"
    assert by_gene["KRAS"]["datasourceId"] == "slapenrich"


def _burden_sources(spark):
    binary = spark.createDataFrame(
        [
            ("G1", "asthma", 1e-9, 2.5, "ptv"),
            ("G2", "asthma", 0.0, 3.0, "ptv"),     # zero p → imputed
            ("G3", "gout", 1e-3, 1.1, "ptv"),      # not significant
            ("G4", "gout", 1e-8, 1.9, "syn"),      # control model → dropped
        ],
        "Gene string, Phenotype string, pValue double, binOddsRatio double, CollapsingModel string",
    )
    quant = spark.createDataFrame(
        [("G5", "height", 1e-12, 0.4, "ptv")],
        "Gene string, Phenotype string, pValue double, beta double, CollapsingModel string",
    )
    controls = spark.createDataFrame(
        [("G4", "syn")], "targetFromSourceId string, statisticalMethod string"
    )
    return binary, quant, controls


def test_gene_burden_federation(spark):
    binary, quant, controls = _burden_sources(spark)
    out = gene_burden_evidence(
        [shape_binary_source(binary), shape_quant_source(quant)],
        control_models=controls,
        expected_rows=(1, 10),
    )
    rows = {r["targetFromSourceId"]: r for r in out.collect()}
    assert set(rows) == {"G1", "G2", "G5"}
    # union-by-name reconciliation: beta null on binary side, OR null on quant
    assert rows["G1"]["beta"] is None and rows["G5"]["oddsRatio"] is None
    # zero p imputed with global min positive (1e-12 from G5)
    assert rows["G2"]["pValue"] == 1e-12
    # mantissa/exponent decomposition
    assert rows["G1"]["pValueExponent"] == -9
    assert abs(rows["G1"]["pValueMantissa"] - 1.0) < 1e-9


def test_gene_burden_expectation_failure(spark):
    binary, quant, controls = _burden_sources(spark)
    with pytest.raises(ExpectationError, match="row_range"):
        gene_burden_evidence(
            [shape_binary_source(binary)], expected_rows=(100, 200)
        )


def _impc_fixture(spark):
    disease_model = spark.createDataFrame(
        [
            ("MGI:1#hom#early", "MGI:1", "OMIM:1", "marfan", 0.9, "model A"),
            ("MGI:1#het#late", "MGI:1", "OMIM:1", "marfan", 0.7, "model B"),
            ("MGI:2#hom#early", "MGI:2", "OMIM:2", "gout", 0.5, "model C"),
        ],
        "model_id string, marker_id string, disease_id string, disease_term string,"
        " disease_model_avg_norm double, model_description string",
    )
    mouse_genes = spark.createDataFrame(
        [("MGI:1", "Fbn1"), ("MGI:2", "Ucp1")],
        "targetInModelMgiId string, targetInModel string",
    )
    gene_map = spark.createDataFrame(
        [("MGI:1", "HGNC:1"), ("MGI:2", "HGNC:2")],
        "gene_id string, hgnc_gene_id string",
    )
    human_genes = spark.createDataFrame(
        [("HGNC:1", "ENSG1"), ("HGNC:2", "ENSG2")],
        "hgnc_gene_id string, targetFromSourceId string",
    )
    model_phenotypes = spark.createDataFrame(
        [
            ("MGI:1#hom#early", "MGI:1", "MP:1 long bones,MP:2 aorta dilation"),
            ("MGI:2#hom#early", "MGI:2", "MP:3 cold intolerance"),
        ],
        "model_id string, marker_id string, model_phenotypes string",
    )
    disease_phenotypes = spark.createDataFrame(
        [("OMIM:1", "HP:1 tall stature,HP:2 lens dislocation")],
        "disease_id string, disease_phenotypes string",
    )
    return (
        disease_model, mouse_genes, gene_map, human_genes,
        model_phenotypes, disease_phenotypes,
    )


def test_impc_multijoin_window(spark):
    dm, mg, gm, hg, mp, dp = _impc_fixture(spark)
    out = impc_evidence(dm, mg, gm, hg, mp, dp).collect()
    # two marfan models share identity fields? No: allelicComposition differs
    # (hom vs het) → both kept; per-identity top-1 keeps each
    rows = {(r["targetFromSourceId"], r["biologicalModelAllelicComposition"]): r
            for r in out}
    assert len(out) == 3
    marfan_hom = rows[("ENSG1", "hom")]
    assert marfan_hom["resourceScore"] == 0.9
    assert [p["phenotype_id"] for p in
            marfan_hom["diseaseModelAssociatedModelPhenotypes"]] == ["MP:1", "MP:2"]
    assert [p["phenotype_term"] for p in
            marfan_hom["diseaseModelAssociatedHumanPhenotypes"]] == [
        "tall stature", "lens dislocation"]
    # gout model has no human phenotype row → left-join null
    assert rows[("ENSG2", "hom")]["diseaseModelAssociatedHumanPhenotypes"] is None


def test_impc_window_dedup_same_identity(spark):
    dm, mg, gm, hg, mp, dp = _impc_fixture(spark)
    # duplicate identity with lower score must be dropped by the window
    extra = spark.createDataFrame(
        [("MGI:1#hom#late", "MGI:1", "OMIM:1", "marfan", 0.4, "model A2")],
        dm.schema,
    )
    out = impc_evidence(dm.union(extra), mg, gm, hg, mp, dp)
    hom_rows = out.where(
        (F.col("targetFromSourceId") == "ENSG1")
        & (F.col("biologicalModelAllelicComposition") == "hom")
    ).collect()
    assert len(hom_rows) == 1 and hom_rows[0]["resourceScore"] == 0.9


def test_mouse_phenotypes_second_output(spark):
    dm, mg, gm, hg, mp, dp = _impc_fixture(spark)
    out = {r["targetFromSourceId"]: r for r in
           mouse_phenotypes_dataset(mg, gm, hg, mp).collect()}
    assert out["ENSG1"]["nModels"] == 1
    assert [p["phenotype_id"] for p in out["ENSG1"]["modelPhenotypes"]] == [
        "MP:1", "MP:2"]


def _encore_wide(spark):
    return spark.createDataFrame(
        [
            ("BRCA1~TP53", 2.0, 2.2, -0.1),
            ("KRAS~EGFR", 0.1, -0.2, 0.05),
        ],
        "id string, SIDM1_CS1_zscore double, SIDM1_CS2_zscore double, "
        "SIDM2_CS1_zscore double",
    )


def test_encore_stouffer_and_pvalue(spark):
    long = stouffer_combine(
        # melt two replicates of SIDM1 + one of SIDM2
        __import__(
            "evidence_datasource_parsers_spark.pipelines.encore_like",
            fromlist=["melt_replicates"],
        ).melt_replicates(_encore_wide(spark))
    )
    rows = {(r["id"], r["cell_line"]): r for r in long.collect()}
    z = rows[("BRCA1~TP53", "SIDM1")]["zscore_combined"]
    assert abs(z - (2.0 + 2.2) / math.sqrt(2)) < 1e-12
    p = rows[("BRCA1~TP53", "SIDM1")]["pValue"]
    assert abs(p - math.erfc(abs(z) / math.sqrt(2))) < 1e-15


def test_encore_gene_pair_explode(spark):
    out = encore_evidence(_encore_wide(spark), p_threshold=0.05).collect()
    pairs = {(r["targetFromSourceId"], r["interactingTargetFromSourceId"])
             for r in out}
    # significant combo BRCA1~TP53/SIDM1 appears in both orientations
    assert ("BRCA1", "TP53") in pairs and ("TP53", "BRCA1") in pairs
    assert all("KRAS" not in p for p in pairs)


def test_essentiality_two_level_nesting(spark):
    wide = spark.createDataFrame(
        [
            ("ACH-1", -0.9, 0.1),
            ("ACH-2", -0.6, None),
        ],
        "depmapId string, `BRCA1 (672)` double, `TP53 (7157)` double",
    )
    meta = spark.createDataFrame(
        [("ACH-1", "cellA", "Lung", "UBERON:1"),
         ("ACH-2", "cellB", "Breast", "UBERON:2")],
        "depmapId string, cellLineName string, tissueFromSource string, tissueId string",
    )
    long = melt_gene_matrix(wide)
    assert {r["targetSymbol"] for r in long.collect()} == {"BRCA1", "TP53"}
    out = {r["targetSymbol"]: r for r in
           essentiality_evidence(wide, meta).collect()}
    brca = out["BRCA1"]["depMapEssentiality"]
    assert len(brca) == 2  # two tissues
    screens = {t["tissueFromSource"]: t["screens"] for t in brca}
    assert screens["Lung"][0]["isEssential"] is True
    assert screens["Breast"][0]["geneEffect"] == -0.6
    # TP53: null effect row dropped → only ACH-1
    assert len(out["TP53"]["depMapEssentiality"]) == 1


def test_biomarkers_explode_heavy(spark):
    from evidence_datasource_parsers_spark.pipelines.biomarkers_like import (
        biomarkers_evidence,
    )

    raw = spark.createDataFrame(
        [
            ("BRAF V600E", "BRAF;KRAS", "MUT", "[Vemurafenib]",
             "Responsive", "Melanoma;Thyroid carcinoma",
             "PMID:12345;NCT004", "A"),
            ("EGFR amp", "EGFR", "AMP", "Gefitinib ",
             "Resistant", "Lung adenocarcinoma", "CancerCommons", "B"),
        ],
        "Biomarker string, Gene string, Alteration string, Drug string,"
        " Association string, PrimaryTumorTypeFullName string,"
        " Source string, EvidenceLevel string",
    )
    out = biomarkers_evidence(
        raw, {"Responsive": "responsive", "Resistant": "resistant"}
    ).collect()
    by_key = {
        (r["targetFromSourceId"], r["diseaseFromSource"]): r for r in out
    }
    # 2 genes × 2 tumors for row 1 → 4 rows, + 1 for row 2
    assert len(out) == 5
    braf_mel = by_key[("BRAF", "Melanoma")]
    assert braf_mel["drugName"] == "Vemurafenib"
    assert braf_mel["Association"] == "responsive"
    assert braf_mel["literature"] == ["12345"]
    assert braf_mel["biomarkers"][0]["name"] == "BRAF V600E"
    egfr = by_key[("EGFR", "Lung adenocarcinoma")]
    assert egfr["literature"] is None  # no PMID → empty set → null


def test_probes_one_hot_and_scores(spark):
    from evidence_datasource_parsers_spark.pipelines.probes_like import (
        probes_evidence,
    )

    probes = spark.createDataFrame(
        [
            ("p1", "SGC-GAK-1", 1, 0, "['inhibitor','binder']", "8", "-"),
            ("p2", "BI-9321", 0, 1, "[]", "0", "5"),
        ],
        "pdid string, compound_name string, set_a int, set_b int,"
        " action string, score1 string, score2 string",
    )
    targets = spark.createDataFrame(
        [("p1", "GAK", "Q14397"), ("p2", "NSD3", "Q9BZ95")],
        "pdid string, target string, uniprot string",
    )
    out = {
        r["target"]: r
        for r in probes_evidence(
            probes,
            {"set_a": "SetA", "set_b": "SetB"},
            targets,
            ["score1", "score2"],
        ).collect()
    }
    gak = out["GAK"]["probes"][0]
    assert gak["probesets"] == ["SetA"]
    assert gak["score1"] == 8 and gak["score2"] is None   # '-' sentinel
    nsd3 = out["NSD3"]["probes"][0]
    assert nsd3["probesets"] == ["SetB"]
    assert nsd3["score1"] is None                          # 0 sentinel


def test_chembl_stop_reason_enrichment(spark):
    from evidence_datasource_parsers_spark.pipelines.chembl_like import (
        chembl_evidence,
        rewrite_url_names,
    )

    evidence = spark.createDataFrame(
        [
            ("ENSG1", "EFO:1", "CHEMBL25", 3, "Slow accrual",
             [{"niceName": "ClinicalTrials", "url": "https://ct.gov/NCT001"}]),
            ("ENSG2", "EFO:2", "CHEMBL26", 4, None,
             [{"niceName": "ClinicalTrials", "url": "https://ct.gov/NCT002"}]),
            ("ENSG3", "EFO:3", "CHEMBL27", 2, None,
             [{"niceName": "Other", "url": "https://example.org/x"}]),
        ],
        "targetFromSourceId string, diseaseFromSourceMappedId string,"
        " drugId string, clinicalPhase int, studyStopReason string,"
        " urls array<struct<niceName:string, url:string>>",
    )
    predictions = spark.createDataFrame(
        [("NCT001", ["Business_Administrative", "Insufficient_Enrollment"])],
        "nct_id string, subclasses array<string>",
    )
    out = chembl_evidence(evidence, predictions)
    rows = {r["targetFromSourceId"]: r for r in out.collect()}
    assert len(rows) == 3  # union preserves every input row
    assert rows["ENSG1"]["studyStopReasonCategories"] == [
        "Business_Administrative", "Insufficient_Enrollment"]
    assert rows["ENSG2"]["studyStopReasonCategories"] is None
    assert "nctId" not in out.columns

    renamed = rewrite_url_names(out, {"ClinicalTrials": "Clinical Trials"})
    urls = {r["targetFromSourceId"]: r["urls"][0]["niceName"]
            for r in renamed.collect()}
    assert urls["ENSG1"] == "Clinical Trials" and urls["ENSG3"] == "Other"


def test_chembl_fraction_expectation_violated(spark):
    from evidence_datasource_parsers_spark.operators.expectations import (
        ExpectationError,
    )
    from evidence_datasource_parsers_spark.pipelines.chembl_like import (
        chembl_evidence,
    )

    evidence = spark.createDataFrame(
        [("ENSG1", "EFO:1", "CHEMBL25", 3, None,
          [{"niceName": "Other", "url": "https://example.org"}])],
        "targetFromSourceId string, diseaseFromSourceMappedId string,"
        " drugId string, clinicalPhase int, studyStopReason string,"
        " urls array<struct<niceName:string, url:string>>",
    )
    predictions = spark.createDataFrame(
        [], "nct_id string, subclasses array<string>"
    )
    with pytest.raises(ExpectationError, match="stop_reason_fraction"):
        chembl_evidence(evidence, predictions)


def test_clingen_preamble_and_shaping(spark, tmp_path):
    from evidence_datasource_parsers_spark.pipelines.clingen_like import (
        clingen_evidence,
        read_clingen_csv,
    )

    p = tmp_path / "clingen.csv"
    p.write_text(
        "CLINGEN GENE VALIDITY CURATIONS\n"
        "FILE CREATED: 2024-01-01\n"
        "WEBPAGE: https://search.clinicalgenome.org\n"
        "+++++++++++\n"
        "GENE SYMBOL,GENE ID,DISEASE LABEL,DISEASE ID,MOI,SOP,CLASSIFICATION,"
        "ONLINE REPORT,CLASSIFICATION DATE,GCEP\n"
        "++++++++++++\n"
        " FBN1 ,HGNC:3603,Marfan syndrome,MONDO:0007947,AD,SOP7,Definitive,"
        "https://x/1,2023-05-12T16:00:00.000Z,cardio\n"
    )
    raw = read_clingen_csv(spark, str(p), preamble_rows=6)
    out = clingen_evidence(raw).collect()
    assert len(out) == 1
    r = out[0]
    assert r["targetFromSourceId"] == "FBN1"           # trimmed
    assert r["confidence"]["date"] == "2023-05-12"     # date_format
    assert r["allelicRequirements"] == ["AD"]
    assert r["urls"][0]["url"] == "https://x/1"


def test_g2p_multifile_and_priority(spark, tmp_path):
    from evidence_datasource_parsers_spark.pipelines.g2p_like import (
        g2p_evidence,
        read_panels,
    )

    header = (
        '"g2p id","gene symbol","gene mim","hgnc id","disease name",'
        '"disease mim","disease MONDO",confidence,"variant consequence",'
        "publications,panel\n"
    )
    (tmp_path / "dd.csv").write_text(
        header
        + 'G1,FBN1,134797,3603,Marfan,154700,MONDO:0007947,definitive,'
        '"absent gene product;uncertain",123;456,DD\n'
    )
    (tmp_path / "eye.csv").write_text(
        header
        + 'G2,ABCA4,601691,34,Stargardt,248200,,limited,'
        'uncertain,,Eye\n'
    )
    panels = read_panels(
        spark, [str(tmp_path / "dd.csv"), str(tmp_path / "eye.csv")]
    )
    out = {r["targetFromSourceId"]: r for r in g2p_evidence(panels).collect()}
    assert len(out) == 2
    assert out["FBN1"]["variantFunctionalConsequence"] == "absent gene product"
    assert out["FBN1"]["literature"] == ["123", "456"]
    # missing MONDO falls back to OMIM prefix
    assert out["ABCA4"]["diseaseFromSourceId"] == "OMIM:248200"
    assert out["ABCA4"]["studyId"] == "Eye"


def test_otar_crispr_study_fanout(spark):
    from evidence_datasource_parsers_spark.pipelines.otar_crispr_like import (
        otar_crispr_evidence,
    )

    screen1 = spark.createDataFrame(
        [
            ("BRCA1_g1", 0.001, 0.9), ("BRCA1_g2", 0.002, 0.9),  # 2 replicates
            ("TP53_g1", 0.0005, 0.9),                            # only 1 → drop
            ("EGFR_g1", 0.5, 0.9), ("EGFR_g2", 0.6, 0.9),        # not sig
            ("CTRLHIT_g1", 0.001, 0.9), ("CTRLHIT_g2", 0.002, 0.9),
        ],
        "id string, `pos|fdr` double, `pos|score` double",
    )
    control = spark.createDataFrame(
        [("CTRLHIT_c1", 0.0001, 0.1)],
        "id string, `pos|fdr` double, `pos|score` double",
    )
    # second study uses the '.'-separator column variant
    screen2 = spark.createDataFrame(
        [("KRAS_g1", 0.004, 0.5)],
        "id string, `pos.fdr` double, `pos.score` double",
    )
    studies = [
        {"studyId": "S1", "projectId": "OTAR001", "diseases": "EFO:1|EFO:2",
         "filterColumn": "pos_fdr", "threshold": 0.01, "replicateNumber": 2,
         "ControlDataset": "ctrl1"},
        {"studyId": "S2", "projectId": "OTAR002", "diseases": "EFO:3",
         "filterColumn": "pos_fdr", "threshold": 0.01, "replicateNumber": 1},
    ]
    out = otar_crispr_evidence(
        studies, {"S1": screen1, "S2": screen2}, {"ctrl1": control}
    ).collect()
    by_gene = {r["targetFromSourceId"]: r for r in out}
    assert set(by_gene) == {"BRCA1", "KRAS"}   # TP53 incomplete, EGFR not sig,
                                               # CTRLHIT anti-joined away
    assert by_gene["BRCA1"]["replicateStats"] == [0.001, 0.002]
    assert by_gene["BRCA1"]["diseases"] == ["EFO:1", "EFO:2"]
    assert by_gene["KRAS"]["studyId"] == "S2"  # '.'-variant normalized


FIXTURE_OBO = """\
format-version: 1.2
ontology: mp

[Term]
id: MP:0000001
name: mammalian phenotype

[Term]
id: MP:0005385
name: cardiovascular system phenotype
is_a: MP:0000001 ! mammalian phenotype

[Term]
id: MP:0005378
name: growth/size phenotype
is_a: MP:0000001 ! mammalian phenotype

[Term]
id: MP:0000275
name: heart hypertrophy
is_a: MP:0005385 ! cardiovascular system phenotype

[Term]
id: MP:0001265
name: decreased body size
is_a: MP:0005378 ! growth/size phenotype

[Term]
id: MP:0009999
name: cardiac dwarfism
is_a: MP:0000275 ! heart hypertrophy
is_a: MP:0001265 ! decreased body size

[Term]
id: MP:0666666
name: retired term
is_a: MP:0005385
is_obsolete: true

[Typedef]
id: part_of
name: part of
"""


def test_obo_parser_and_class_map(spark):
    """Stdlib OBO ingestion, parity IMPC.py:307-317: direct children of the
    root are high-level classes; every term maps to the class(es) it
    descends from; multi-parent terms map to both."""
    from evidence_datasource_parsers_spark.sources.obo import (
        OboOntology,
        phenotype_class_map,
    )

    onto = OboOntology.from_text(FIXTURE_OBO)
    assert onto.terms["MP:0666666"].obsolete
    assert "part_of" not in onto.terms  # [Typedef] stanzas skipped
    assert onto.high_level_classes("MP:0000001") == {
        "MP:0005385", "MP:0005378",
    }
    # subclasses includes self (pronto parity) and follows multi-parent
    assert onto.subclasses("MP:0000275") == {"MP:0000275", "MP:0009999"}

    lut = phenotype_class_map(spark, onto, "MP:0000001")
    got = {
        (r.modelPhenotypeId, r.modelPhenotypeClassId): r.modelPhenotypeClassLabel
        for r in lut.collect()
    }
    # the dual-parent term appears under BOTH high-level classes
    assert got[("MP:0009999", "MP:0005385")] == "cardiovascular system phenotype"
    assert got[("MP:0009999", "MP:0005378")] == "growth/size phenotype"
    assert got[("MP:0000275", "MP:0005385")] == "cardiovascular system phenotype"
    # obsolete terms still map (the reference does not filter them either)
    assert ("MP:0666666", "MP:0005385") in got


def test_obo_class_map_joins_into_impc_phenotypes(spark):
    """The ontology LUT consumed the way IMPC uses it: broadcast-joined
    onto exploded model phenotypes to annotate each with its high-level
    class."""
    from pyspark.sql import functions as F

    from evidence_datasource_parsers_spark.pipelines.impc_like import (
        explode_phenotypes,
    )
    from evidence_datasource_parsers_spark.sources.obo import (
        OboOntology,
        phenotype_class_map,
    )

    models = spark.createDataFrame(
        [("m1", "MP:0000275 heart hypertrophy,MP:0001265 decreased body size")],
        "model_id string, model_phenotypes string",
    )
    lut = phenotype_class_map(
        spark, OboOntology.from_text(FIXTURE_OBO), "MP:0000001"
    )
    out = (
        explode_phenotypes(models)
        .join(
            F.broadcast(lut),
            F.col("phenotype_id") == F.col("modelPhenotypeId"),
        )
        .select("model_id", "phenotype_id", "modelPhenotypeClassId")
        .collect()
    )
    got = {(r.phenotype_id, r.modelPhenotypeClassId) for r in out}
    assert got == {
        ("MP:0000275", "MP:0005385"),
        ("MP:0001265", "MP:0005378"),
    }


def test_obo_strips_comments_on_any_tag():
    from evidence_datasource_parsers_spark.sources.obo import OboOntology

    onto = OboOntology.from_text(
        """[Term]
id: MP:0000001 ! the root
name: mammalian phenotype ! a comment

[Term]
id: MP:0000002
name: escaped bang \\! kept
is_a: MP:0000001 ! mammalian phenotype
"""
    )
    assert "MP:0000001" in onto.terms
    assert onto.terms["MP:0000001"].name == "mammalian phenotype"
    assert onto.terms["MP:0000002"].name == "escaped bang ! kept"
    assert onto.terms["MP:0000002"].parents == ["MP:0000001"]


FIXTURE_OWL = """\
<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
         xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#"
         xmlns:owl="http://www.w3.org/2002/07/owl#"
         xmlns:oboInOwl="http://www.geneontology.org/formats/oboInOwl#">
  <owl:Ontology rdf:about="http://purl.obolibrary.org/obo/mp.owl"/>
  <owl:Class rdf:about="http://purl.obolibrary.org/obo/MP_0000001">
    <rdfs:label>mammalian phenotype</rdfs:label>
  </owl:Class>
  <owl:Class rdf:about="http://purl.obolibrary.org/obo/MP_0005385">
    <rdfs:label>cardiovascular system phenotype</rdfs:label>
    <rdfs:subClassOf rdf:resource="http://purl.obolibrary.org/obo/MP_0000001"/>
  </owl:Class>
  <owl:Class rdf:about="http://purl.obolibrary.org/obo/MP_0005378">
    <rdfs:label>growth/size phenotype</rdfs:label>
    <rdfs:subClassOf rdf:resource="http://purl.obolibrary.org/obo/MP_0000001"/>
  </owl:Class>
  <owl:Class rdf:about="http://purl.obolibrary.org/obo/MP_0000275">
    <rdfs:label>heart hypertrophy</rdfs:label>
    <rdfs:subClassOf rdf:resource="http://purl.obolibrary.org/obo/MP_0005385"/>
    <rdfs:subClassOf>
      <owl:Restriction>
        <owl:onProperty rdf:resource="http://purl.obolibrary.org/obo/BFO_0000050"/>
        <owl:someValuesFrom rdf:resource="http://purl.obolibrary.org/obo/MP_0005378"/>
      </owl:Restriction>
    </rdfs:subClassOf>
  </owl:Class>
  <owl:Class rdf:about="http://purl.obolibrary.org/obo/MP_0001265">
    <rdfs:label>decreased body size</rdfs:label>
    <rdfs:subClassOf rdf:resource="http://purl.obolibrary.org/obo/MP_0005378"/>
  </owl:Class>
  <owl:Class rdf:about="http://purl.obolibrary.org/obo/MP_0009999">
    <rdfs:label>cardiac dwarfism</rdfs:label>
    <oboInOwl:hasAlternativeId>MP:0009998</oboInOwl:hasAlternativeId>
    <rdfs:subClassOf rdf:resource="http://purl.obolibrary.org/obo/MP_0000275"/>
    <rdfs:subClassOf rdf:resource="http://purl.obolibrary.org/obo/MP_0001265"/>
  </owl:Class>
  <owl:Class rdf:about="http://purl.obolibrary.org/obo/MP_0666666">
    <rdfs:label>retired term</rdfs:label>
    <rdfs:subClassOf rdf:resource="http://purl.obolibrary.org/obo/MP_0005385"/>
    <owl:deprecated rdf:datatype="http://www.w3.org/2001/XMLSchema#boolean">true</owl:deprecated>
  </owl:Class>
</rdf:RDF>
"""


def test_owl_parser_parity_with_obo():
    """The SAME ontology rendered as OBO text and as RDF/XML OWL yields
    IDENTICAL class maps — the parity the reference gets for free by
    feeding pronto either format (IMPC.py:307-317 over mp.owl)."""
    from evidence_datasource_parsers_spark.sources.obo import OboOntology
    from evidence_datasource_parsers_spark.sources.owl import parse_owl_text

    obo = OboOntology.from_text(FIXTURE_OBO)
    owl = parse_owl_text(FIXTURE_OWL)
    assert set(owl.terms) == set(obo.terms)
    assert owl.class_map_rows("MP:0000001") == obo.class_map_rows("MP:0000001")
    assert owl.high_level_classes("MP:0000001") == {"MP:0005385", "MP:0005378"}
    # owl:Restriction superclass is NOT an is_a edge: heart hypertrophy
    # must not descend from growth/size phenotype
    assert "MP:0000275" not in owl.subclasses("MP:0005378")
    # deprecated and alt-id survive the format change
    assert owl.terms["MP:0666666"].obsolete
    assert owl.terms["MP:0009999"].alt_ids == ["MP:0009998"]


def test_owl_load_ontology_dispatch(tmp_path):
    """Extension- and content-based dispatch: .owl and extensionless XML go
    to the OWL parser, .obo to the OBO parser — same class maps out."""
    from evidence_datasource_parsers_spark.sources.owl import load_ontology

    owl_path = tmp_path / "mp.owl"
    owl_path.write_text(FIXTURE_OWL)
    obo_path = tmp_path / "mp.obo"
    obo_path.write_text(FIXTURE_OBO)
    sniffed = tmp_path / "mystery"
    sniffed.write_text(FIXTURE_OWL)
    a = load_ontology(str(owl_path)).class_map_rows("MP:0000001")
    b = load_ontology(str(obo_path)).class_map_rows("MP:0000001")
    c = load_ontology(str(sniffed)).class_map_rows("MP:0000001")
    assert a == b == c and len(a) > 0


def test_owl_iri_to_curie():
    from evidence_datasource_parsers_spark.sources.owl import iri_to_curie

    assert iri_to_curie("http://purl.obolibrary.org/obo/MP_0000001") == "MP:0000001"
    assert iri_to_curie("http://www.ebi.ac.uk/efo/EFO_0000408") == "EFO:0000408"
    assert iri_to_curie("http://example.org/onto#GO_0008150") == "GO:0008150"
    # underscore in the local part: only the FIRST splits
    assert iri_to_curie("http://x.org/obo/ABC_1_2") == "ABC:1_2"
    assert iri_to_curie("already:curie") == "already:curie"
