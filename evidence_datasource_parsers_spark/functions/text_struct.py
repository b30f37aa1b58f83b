"""Irregular free-text → typed struct extraction (D5/D6).

The reference parses screen descriptions like
"CRISPRi screen. Experiment: survival. Analysis: MAGeCK" into
{title, experiment, analysis} with a row UDF (``modules/BrainCRISPR.py:118-175``)
and biomarker codes via a nested config map (``ValidationLab.py:126-170``).

Two implementations, in preference order:
  * ``parse_description_native`` — regexp_extract chain (codegen, zero Python)
    for the regular-enough cases;
  * ``parse_description_udf`` — Arrow-batched pandas UDF for genuinely
    irregular text where a regex chain would be unmaintainable.  Lazily
    registered (pandas_udf needs an active session).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DESC_SCHEMA = "title string, experiment string, analysis string"


def parse_description_native(col: Column | str) -> Column:
    """'<title>. Experiment: <e>. Analysis: <a>' → struct, null-safe parts."""
    c = F.col(col) if isinstance(col, str) else col

    def part(pattern: str) -> Column:
        x = F.regexp_extract(c, pattern, 1)
        return F.when(x != "", x)

    return F.struct(
        part(r"^([^.]+)\.").alias("title"),
        part(r"Experiment:\s*([^.]+)").alias("experiment"),
        part(r"Analysis:\s*([^.]+)").alias("analysis"),
    )


def parse_description_udf():
    """The UDF tier for irregular text (D5) — same output contract.

    Kernel logic mirrors the native chain but can grow arbitrary Python
    (tokenizers, heuristics) without touching the plan shape.
    """
    import re

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _parse(text: str):
        if text is None:
            return (None, None, None)
        title = re.match(r"^([^.]+)\.", text)
        exp = re.search(r"Experiment:\s*([^.]+)", text)
        ana = re.search(r"Analysis:\s*([^.]+)", text)
        return (
            title.group(1) if title else None,
            exp.group(1).strip() if exp else None,
            ana.group(1).strip() if ana else None,
        )

    # NB: untyped signature — Spark 4 rejects the (Series) -> DataFrame type
    # hint for struct-returning scalar pandas UDFs; the returnType carries the
    # struct schema instead.
    def _kernel(s):
        parsed = s.map(_parse)
        return pd.DataFrame(
            {
                "title": parsed.map(lambda t: t[0]),
                "experiment": parsed.map(lambda t: t[1]),
                "analysis": parsed.map(lambda t: t[2]),
            }
        )

    return pandas_udf(_kernel, DESC_SCHEMA)
