"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001; ``queries()`` exposes the
full catalog (one entry per implemented SURVEY §2 operator family);
``oracle_sql()`` returns the DuckDB twin of each query.  The catalog itself
lives in ``evidence_datasource_parsers_spark/plans/``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO_ROOT)
# Executor Python workers inherit PYTHONPATH from the JVM's environment —
# sys.path edits on the driver do NOT propagate.  Any query using
# mapInPandas/pandas UDFs that reference this package (e.g. the multimodal
# kernels) needs this set BEFORE the SparkSession's JVM starts.
if REPO_ROOT not in os.environ.get("PYTHONPATH", ""):
    os.environ["PYTHONPATH"] = (
        REPO_ROOT + os.pathsep + os.environ.get("PYTHONPATH", "")
    )

from evidence_datasource_parsers_spark.plans import CATALOG  # noqa: E402
from evidence_datasource_parsers_spark.plans.catalog import (  # noqa: E402
    ensure_oracle_confs,
)


def _wrap(builder) -> Callable[[SparkSession, str], DataFrame]:
    """The driver runs these builders on its own VANILLA SparkSession, so
    the catalog's timestamp assumptions (UTC session TZ, parquet
    nanos-as-long) are pinned here — once per session, scoped to the
    correctness path instead of mutating conf inside every table scan."""

    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        ensure_oracle_confs(spark)
        return builder(spark, sf_dir)

    return wrapped


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: pricing summary on /root/testdata/sf0.001."""
    return _wrap(CATALOG["q01_pricing_summary"].builder)(
        spark, "/root/testdata/sf0.001"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _wrap(q.builder) for name, q in CATALOG.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: q.oracle for name, q in CATALOG.items() if q.oracle is not None
    }
