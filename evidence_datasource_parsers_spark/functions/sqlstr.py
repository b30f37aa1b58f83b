"""Spark-SQL string-building helpers shared by the r13 SQL-string twin
builders (guide §1.3 driver path: the Column API costs one py4j round
trip per expression node; hot expression trees parse JVM-side from ONE
string instead).  Fidelity rules the twins rely on:

* identifiers are backtick-quoted (:func:`qid`) so odd column names
  survive the parser;
* string literals are backslash-escaped (:func:`slit`) — interpolating
  un-escaped literals is a silent-divergence trap under salt/label/
  pattern changes (the r13 escaping lesson);
* double literals carry the ``D`` suffix (:func:`dlit`): bare decimals
  parse as DECIMAL in Spark SQL, which would NOT match the Column
  forms' ``F.lit(float(...))``;
* SQL lambda variables must be named x/y/z to mirror the Column API's
  fixed naming, or twin plans differ only by variable name.
"""

from __future__ import annotations

import math


def qid(name: str) -> str:
    """Backtick-quote an identifier for Spark SQL."""
    return "`" + name.replace("`", "``") + "`"


def slit(s: str) -> str:
    """Single-quoted Spark SQL string literal (backslash escaping)."""
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def dlit(x: float) -> str:
    """Double literal matching ``F.lit(float(x))``."""
    x = float(x)
    if math.isinf(x):
        return f"CAST('{'' if x > 0 else '-'}Infinity' AS DOUBLE)"
    if math.isnan(x):
        return "CAST('NaN' AS DOUBLE)"
    return repr(x) + "D"
