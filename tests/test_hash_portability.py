"""Property tests: the portable hash family must agree bit-for-bit between
Spark and DuckDB on arbitrary strings — this is the foundation the whole
dedup/fingerprint oracle story rests on."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from evidence_datasource_parsers_spark.functions.hashing import (
    P_BASE,
    P_PERM,
    perm_coefficients,
    portable_hash,
    portable_hash_sql,
)

# printable-ish unicode, excluding surrogates; includes quotes and newlines
TEXT = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), max_codepoint=0x2FFF),
    min_size=0,
    max_size=60,
)


@settings(max_examples=30, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=8, unique=True))
def test_portable_hash_matches_duckdb(spark, texts):
    sdf = spark.createDataFrame([(t,) for t in texts], "s string")
    got = {
        r["s"]: r["h"]
        for r in sdf.select("s", portable_hash("s").alias("h")).collect()
    }
    con = duckdb.connect()
    for t in texts:
        (want,) = con.execute(
            f"SELECT {portable_hash_sql('?')}".replace("?", "$tx"),
            {"tx": t},
        ).fetchone()
        assert got[t] == want, f"hash mismatch for {t!r}"


def test_perm_family_int64_safe():
    """A_i * base + B_i must stay below 2^63 for every permutation used."""
    worst_base = P_BASE - 1
    for i in range(256):
        a, b = perm_coefficients(i)
        assert 0 < a < P_PERM and 0 <= b < P_PERM
        assert a * worst_base + b < 2**62  # ample headroom


@pytest.mark.parametrize("s", ["", "a", "ü", "日本語", 'quo"te', "tab\tsep"])
def test_portable_hash_edge_strings(spark, s):
    sdf = spark.createDataFrame([(s,)], "s string")
    (got,) = sdf.select(portable_hash("s")).first()
    (want,) = duckdb.connect().execute(
        f"SELECT {portable_hash_sql('$tx')}", {"tx": s}
    ).fetchone()
    assert got == want


from hypothesis import example


@settings(max_examples=40, deadline=None)
@given(
    st.floats(min_value=1e-30, max_value=0.99, allow_nan=False,
              allow_infinity=False)
)
@example(3.2e-7)
@example(0.05)
def test_pvalue_decomposition_roundtrip(spark, p):
    """mantissa * 10^exponent must reconstruct p to float precision, with
    1 <= |mantissa| < 10 (away from power-of-ten boundary noise)."""
    from evidence_datasource_parsers_spark.functions.pvalues import (
        pvalue_mantissa_exponent,
    )

    df = spark.createDataFrame([(p,)], "p double")
    m, e = pvalue_mantissa_exponent("p", precision=6)
    row = df.select(m.alias("m"), e.alias("e")).first()
    recon = row["m"] * 10 ** row["e"]
    assert abs(recon - p) / p < 1e-5
    assert 0.95 <= row["m"] < 10.05  # rounding can nudge past the boundary
