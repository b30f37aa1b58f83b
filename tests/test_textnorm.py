"""Unicode normalization: look-alike folding, accent stripping, the
dedup-key contract (variants collapse to one fingerprint), null safety."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from evidence_datasource_parsers_spark.functions.textnorm import (
    dedup_key,
    normalize_unicode,
    strip_accents,
)


def _one(spark, col):
    df = spark.createDataFrame([(1,)], "i int")
    return df.select(col.alias("v")).first().v


def test_nfkc_folds_compatibility_forms(spark):
    df = spark.createDataFrame(
        [("ﬁle",), ("Ｈｅｌｌｏ",), ("x²",), (None,)], "t string"
    )
    got = [r.v for r in
           df.select(normalize_unicode("t", "nfkc").alias("v")).collect()]
    assert got == ["file", "Hello", "x2", None]


def test_nfc_composes_but_keeps_compat(spark):
    # e + combining acute → precomposed é; ligature ﬁ untouched under NFC
    df = spark.createDataFrame([("é ﬁ",)], "t string")
    v = df.select(normalize_unicode("t", "nfc").alias("v")).first().v
    assert v == "é ﬁ"


def test_nfkc_casefold(spark):
    df = spark.createDataFrame([("STRASSE ß Ａ",)], "t string")
    v = df.select(
        normalize_unicode("t", "nfkc_casefold").alias("v")
    ).first().v
    assert v == "strasse ss a"


def test_strip_accents(spark):
    df = spark.createDataFrame(
        [("café naïve é é",), (None,)], "t string"
    )
    got = [r.v for r in df.select(strip_accents("t").alias("v")).collect()]
    assert got == ["cafe naive e e", None]


def test_dedup_key_collapses_variants(spark):
    variants = [
        "Café  Menu",          # precomposed é, double space
        "café MENU",          # combining accent, case variant
        "Ｃafé Menu",           # full-width C
    ]
    df = spark.createDataFrame([(v,) for v in variants], "t string")
    keys = {r.v for r in
            df.select(dedup_key("t", accent_fold=True).alias("v")).collect()}
    assert keys == {"cafe menu"}
    # without accent folding the é is preserved but still canonical
    keys2 = {r.v for r in
             df.select(dedup_key("t").alias("v")).collect()}
    assert keys2 == {"café menu"}


def test_invalid_form_raises(spark):
    with pytest.raises(ValueError, match="form"):
        normalize_unicode(F.lit("x"), "nfd")
