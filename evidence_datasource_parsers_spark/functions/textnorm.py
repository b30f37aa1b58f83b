"""Unicode normalization for dedup and fingerprint stability.

Exact/near-dup hashing breaks on Unicode look-alikes: full-width CJK
forms (Ａ vs A), compatibility ligatures (ﬁ vs fi), precomposed vs
combining accents (é as U+00E9 vs e+U+0301), and case variants all hash
differently while reading identically.  Canonicalizing BEFORE
fingerprinting is what makes a crawl-dedup store stable across sources.

Spark has no NFKC built-in, so these are Arrow-batched pandas UDFs over
stdlib ``unicodedata`` — no external deps, deterministic across platforms
(the Unicode tables ship with CPython; pin the Python version across the
cluster as you already must for pickled closures).

Policy tiers, weakest to strongest:

* ``nfc``          — canonical composition only; visually identical text,
                     bytes may still differ across sources
* ``nfkc``         — + compatibility folding (ligatures, widths,
                     superscripts); the right default for dedup keys
* ``nfkc_casefold``— + Unicode casefold; the aggressive dedup-key tier
                     (also what WHATWG/IDNA use for identifier matching)

``strip_accents`` is orthogonal: NFD-decompose, drop combining marks,
recompose — "café" ≡ "cafe" matching for search/fingerprints.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

_FORMS = ("nfc", "nfkc", "nfkc_casefold")


def normalize_unicode(text: Column | str, form: str = "nfkc") -> Column:
    """Normalize a string column to ``form`` (see module policy tiers).
    NULLs pass through."""
    if form not in _FORMS:
        raise ValueError(f"form must be one of {_FORMS}, got {form!r}")
    uform = "NFKC" if form == "nfkc_casefold" else form.upper()
    casefold = form == "nfkc_casefold"

    @pandas_udf("string")
    def _norm(s: pd.Series) -> pd.Series:
        def one(v):
            if v is None:
                return None
            out = unicodedata.normalize(uform, v)
            return out.casefold() if casefold else out

        return s.map(one)

    col = F.col(text) if isinstance(text, str) else text
    return _norm(col)


def strip_accents(text: Column | str) -> Column:
    """Remove combining marks: NFD-decompose, drop Mn-category codepoints,
    NFC-recompose.  NULLs pass through."""

    @pandas_udf("string")
    def _strip(s: pd.Series) -> pd.Series:
        def one(v):
            if v is None:
                return None
            decomposed = unicodedata.normalize("NFD", v)
            kept = "".join(
                c for c in decomposed if unicodedata.category(c) != "Mn"
            )
            return unicodedata.normalize("NFC", kept)

        return s.map(one)

    col = F.col(text) if isinstance(text, str) else text
    return _strip(col)


def dedup_key(text: Column | str, accent_fold: bool = False) -> Column:
    """The recommended canonical text for fingerprinting: NFKC + casefold,
    optionally accent-folded, whitespace collapsed and trimmed.  Feed THIS
    to exact_dedupe / minhash / simhash so byte-level Unicode variance
    never fragments a dup group."""
    c = normalize_unicode(text, "nfkc_casefold")
    if accent_fold:
        c = strip_accents(c)
    return F.trim(F.regexp_replace(c, r"\s+", " "))
