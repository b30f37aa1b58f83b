"""Skew-mitigation join: explicit key salting.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime, but it only helps sort-merge joins AFTER a skewed shuffle exists.
Salting restructures the plan itself: the skewed fact side gets a random-ish
salt in [0, n_salts); the dimension side is replicated ×n_salts; the join key
becomes (key, salt) — hot keys spread over n_salts reducers.

The salt must be DETERMINISTIC (derived from a unique column, not rand()) so
re-runs produce identical partitioning — same reproducibility rule as the
train/val/test split (catalog_ext.q50).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from evidence_datasource_parsers_spark.functions.hashing import portable_hash


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    n_salts: int = 8,
    salt_source: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join *fact* (skewed on ``on``) with *dim*, spreading hot keys.

    salt_source: a unique-ish fact column the salt is hashed from (defaults
    to the join key itself combined with a per-row monotonic component is NOT
    used — pass a real unique column for even spreading).
    """
    src = F.col(salt_source) if salt_source else F.col(on)
    salted_fact = fact.withColumn(
        "__salt", (portable_hash(src.cast("string")) % n_salts).cast("int")
    )
    salts = F.explode(
        F.sequence(F.lit(0), F.lit(n_salts - 1))
    ).alias("__salt")
    salted_dim = dim.select("*", salts)
    out = salted_fact.join(salted_dim, on=[on, "__salt"], how=how)
    return out.drop("__salt")
