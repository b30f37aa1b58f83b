"""The plan auditor itself: known-bad constructs must flag, the wanted
shapes (1-row scalar broadcast, top-k, Arrow stages) must not."""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")
from tools.plan_audit import audit_plan  # noqa: E402


def _plans(df):
    qe = df._jdf.queryExecution()
    return qe.executedPlan().toString(), qe.optimizedPlan().toString()


def _plan(df):
    return _plans(df)[0]


def test_cartesian_flags(spark):
    a = spark.range(10)
    b = spark.range(10).withColumnRenamed("id", "id2")
    plan = _plan(a.crossJoin(b))
    assert any("Cartesian" in f or "NestedLoop" in f
               for f in audit_plan(plan))


def test_row_at_a_time_udf_flags(spark):
    from pyspark.sql.functions import udf

    slow = udf(lambda x: x + 1, "bigint")
    plan = _plan(spark.range(10).select(slow("id")))
    assert any("BatchEvalPython" in f for f in audit_plan(plan))


def test_scalar_broadcast_and_topk_pass(spark):
    df = spark.range(100).withColumn("v", F.col("id") * 2)
    scalar = df.agg(F.max("v").alias("mx"))
    joined = df.crossJoin(F.broadcast(scalar)).where(
        F.col("v") > F.col("mx") - 10
    )
    assert audit_plan(_plan(joined)) == []
    topk = df.orderBy(F.col("v").desc()).limit(5)
    assert audit_plan(_plan(topk)) == []


def test_global_sort_flags(spark):
    df = spark.range(100).orderBy("id")
    assert any("global Sort" in f for f in audit_plan(*_plans(df)))
    # partition-local sort is fine; so is top-k
    ok = spark.range(100).sortWithinPartitions("id")
    assert audit_plan(*_plans(ok)) == []
    topk = spark.range(100).orderBy("id").limit(3)
    assert audit_plan(*_plans(topk)) == []


def test_catalog_sweep_no_red_flags(spark, sf_dir):
    """Every catalog query's plan stays free of scale red flags — the
    regression guard version of tools/plan_audit.py (same detectors,
    same single documented allowance)."""
    from evidence_datasource_parsers_spark.plans import CATALOG
    from tools.plan_audit import ALLOW

    flagged = {}
    for name, q in sorted(CATALOG.items()):
        df = q.builder(spark, sf_dir)
        qe = df._jdf.queryExecution()
        flags = audit_plan(
            qe.executedPlan().toString(), qe.optimizedPlan().toString()
        )
        if flags and name not in ALLOW:
            flagged[name] = flags
    assert flagged == {}
