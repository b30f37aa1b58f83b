"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001; ``queries()`` exposes the
full catalog (one entry per implemented SURVEY §2 operator family);
``oracle_sql()`` returns the DuckDB twin of each query.  The catalog itself
lives in ``evidence_datasource_parsers_spark/plans/``.
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")

from evidence_datasource_parsers_spark.plans import CATALOG  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: pricing summary on /root/testdata/sf0.001."""
    return CATALOG["q01_pricing_summary"].builder(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.builder for name, q in CATALOG.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: q.oracle for name, q in CATALOG.items() if q.oracle is not None
    }
