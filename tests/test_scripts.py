"""Unicode-script language ID (functions/textstats.py:script_count/
dominant_script) — the tier above the Latin-only stopword lang-ID."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from evidence_datasource_parsers_spark.functions.textstats import (
    UNICODE_SCRIPTS,
    dominant_script,
    script_count,
)


@pytest.fixture(scope="module")
def scripted(spark):
    rows = [
        (1, "plain english text"),
        (2, "Привет мир and x"),
        (3, "東京は日本の首都です"),
        (4, "カタカナ テキスト"),
        (5, "مرحبا بالعالم"),
        (6, "한국어 텍스트"),
        (7, "12345 ... !!"),
        (8, None),
        (9, "ひらがな と 漢字 が 混ざる 文章 です よ ね"),
    ]
    return spark.createDataFrame(rows, "id long, t string")


def test_script_counts(spark, scripted):
    got = {
        r["id"]: r
        for r in scripted.select(
            "id",
            script_count("t", "latin").alias("lat"),
            script_count("t", "cyrillic").alias("cyr"),
            script_count("t", "han").alias("han"),
            script_count("t", "katakana").alias("kata"),
        ).collect()
    }
    assert got[1]["lat"] == len("plainenglishtext")
    assert got[2]["cyr"] == len("Приветмир")
    assert got[2]["lat"] == len("andx")
    assert got[3]["han"] > 0 and got[3]["lat"] == 0
    assert got[4]["kata"] == len("カタカナテキスト")
    assert got[7]["lat"] == got[7]["cyr"] == 0  # digits/punct are Common
    assert got[8]["lat"] is None  # NULL in, NULL out


def test_dominant_script(spark, scripted):
    got = {
        r["id"]: r["s"]
        for r in scripted.select(
            "id", dominant_script("t").alias("s")
        ).collect()
    }
    assert got[1] == "latin"
    assert got[2] == "cyrillic"  # 9 cyrillic > 4 latin
    assert got[4] == "katakana"
    assert got[5] == "arabic"
    assert got[6] == "hangul"
    assert got[7] == "none"  # no listed script at all
    assert got[9] == "hiragana"  # hiragana beats the han sprinkle


def test_dominant_script_tie_breaks_lexicographically(spark):
    # exactly one char of each: struct max picks the lex-GREATEST name
    df = spark.createDataFrame([("a東",)], "t string")
    assert (
        df.select(dominant_script("t").alias("s")).collect()[0]["s"]
        == "latin"  # 'latin' > 'han'
    )


def test_unknown_script_raises():
    with pytest.raises(ValueError):
        script_count(F.lit("x"), "klingon")


def test_narrowed_candidates(spark):
    df = spark.createDataFrame([("Привет z",)], "t string")
    s = df.select(
        dominant_script("t", scripts=("latin", "han")).alias("s")
    ).collect()[0]["s"]
    assert s == "latin"  # cyrillic not a candidate


def test_all_scripts_valid_java_classes(spark):
    # every UNICODE_SCRIPTS entry must compile as a Java \p{IsXxx} class
    df = spark.createDataFrame([("x",)], "t string")
    cols = [
        script_count("t", s).alias(s) for s in UNICODE_SCRIPTS
    ]
    row = df.select(*cols).collect()[0]
    assert row["latin"] == 1
    assert sum(row[s] for s in UNICODE_SCRIPTS if s != "latin") == 0
