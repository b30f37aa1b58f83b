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


def reject_reserved_columns(cols, reserved, op: str) -> None:
    """Refuse input columns that collide with an operator's internal
    working names.  The r13 ``selectExpr("*", ...)`` rewrites APPEND
    internal columns instead of replacing same-named ones (withColumn
    semantics), so a pre-existing ``__ts``/``__pt``/… would surface later
    as an ambiguous-reference AnalysisException; fail up front with a
    message that names the offenders instead.  Only ACTUAL collisions are
    rejected — ``__``-prefixed inputs that don't match an internal name
    pass through untouched (catalog builders legitimately carry them)."""
    bad = sorted(set(cols) & set(reserved))
    if bad:
        raise ValueError(
            f"{op}: these input column names collide with the operator's "
            f"internal working columns; rename them: {bad}"
        )


def slit(s: str) -> str:
    """Single-quoted Spark SQL string literal.

    Quotes are escaped by doubling (``''``), which parses identically
    under BOTH parser modes; backslashes are doubled, which is correct
    only while ``spark.sql.parser.escapedStringLiterals`` stays at its
    default ``false`` (the session factory pins it, and literals that
    carry no backslash are mode-independent either way)."""
    return "'" + s.replace("\\", "\\\\").replace("'", "''") + "'"


def dlit(x: float) -> str:
    """Double literal matching ``F.lit(float(x))``."""
    x = float(x)
    if math.isinf(x):
        return f"CAST('{'' if x > 0 else '-'}Infinity' AS DOUBLE)"
    if math.isnan(x):
        return "CAST('NaN' AS DOUBLE)"
    return repr(x) + "D"
