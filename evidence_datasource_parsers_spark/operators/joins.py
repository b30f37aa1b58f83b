"""Join-tier operators J1-J9, U1-U3 and the external-enrichment pattern D9/D10
(SURVEY §2.5, §2.9, §2.15).

Scale notes baked into each helper:
  * dimension sides are ``broadcast()``-hinted when small (J9) — a LUT join
    must never shuffle the fact table;
  * the enrichment pattern runs the expensive external function over
    *distinct keys only*, then joins back null-safely — at 100 TB the distinct
    keyset is orders of magnitude smaller than the fact table.
"""

from __future__ import annotations

from collections.abc import Callable
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def union_by_name(dfs: list[DataFrame], allow_missing: bool = True) -> DataFrame:
    """Schema-reconciling union (U1), parity ``modules/GeneBurden.py:55-56``.

    ``unionByName(allowMissingColumns=True)`` fills absent columns with nulls.
    Heterogeneous *types* for a same-named column still raise — define explicit
    target schemas per union (SURVEY §7.4 risk 2).
    """
    return reduce(
        lambda a, b: a.unionByName(b, allowMissingColumns=allow_missing), dfs
    )


_SIZE_SUFFIXES = {
    "b": 1,
    "k": 1 << 10,
    "kb": 1 << 10,
    "m": 1 << 20,
    "mb": 1 << 20,
    "g": 1 << 30,
    "gb": 1 << 30,
    "t": 1 << 40,
    "tb": 1 << 40,
}


def _parse_size(text: str) -> int:
    """Spark size-conf string ('10MB', '10485760b', '-1') → bytes."""
    t = str(text).strip().lower()
    for suffix in sorted(_SIZE_SUFFIXES, key=len, reverse=True):
        if t.endswith(suffix):
            return int(t[: -len(suffix)]) * _SIZE_SUFFIXES[suffix]
    return int(t)


def plan_size_bytes(df: DataFrame) -> int:
    """Catalyst's optimized-plan size estimate for ``df`` in bytes — the
    same statistic the auto-broadcast rule consults.  Computed from plan
    metadata (file sizes × filter selectivity); runs no job."""
    return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())


def broadcast_if_small(
    df: DataFrame,
    threshold_bytes: int | None = None,
    proxy: DataFrame | None = None,
) -> DataFrame:
    """Size-gated broadcast hint (J9, the scale-safe form).

    A pinned ``F.broadcast()`` bypasses ``autoBroadcastJoinThreshold``
    entirely: right for spec-bounded dims (nation=25, region=5 rows) but an
    executor OOM for any table that grows with the dataset (supplier is
    SF-proportional — ~1k rows at sf0.1, ~10⁹ at 100 TB).  This helper
    applies the hint only while Catalyst's own size estimate is under the
    threshold (defaulting to the session's ``autoBroadcastJoinThreshold``),
    so small inputs keep the single-shuffle broadcast-hash plan and
    oversized ones fall back to the optimizer's choice (sort-merge, or an
    AQE runtime broadcast if post-shuffle stats allow).

    A negative/disabled threshold never hints — it respects an operator who
    set ``autoBroadcastJoinThreshold=-1`` to forbid broadcasts.

    ``proxy`` gates on ANOTHER frame's size estimate.  Catalyst reports
    ``defaultSizeInBytes`` (effectively infinite) for plans it can't
    estimate — anything above a Generate/explode — so a derived frame like
    an exploded n-gram stream would never pass its own stats check even
    when it is KB-sized.  When the derived frame's true size is the same
    order as a stats-bearing ancestor (gram hashes ≈ 8 B per source-text
    token ≈ the text bytes themselves), pass that ancestor as the proxy.
    """
    if threshold_bytes is None:
        conf = df.sparkSession.conf.get(
            "spark.sql.autoBroadcastJoinThreshold", "10MB"
        )
        threshold_bytes = _parse_size(conf)
    measured = proxy if proxy is not None else df
    if threshold_bytes >= 0 and plan_size_bytes(measured) <= threshold_bytes:
        return F.broadcast(df)
    return df


def broadcast_lut_join(
    fact: DataFrame,
    lut: DataFrame,
    on: list[str] | str,
    how: str = "left",
) -> DataFrame:
    """Dimension-table join with an explicit broadcast hint (J2+J9).

    The reference relies on Catalyst auto-broadcast; at 100 TB an explicit
    hint removes the risk of a sort-merge shuffle when stats are missing.
    """
    return fact.join(F.broadcast(lut), on=on, how=how)


def anti_join(
    df: DataFrame, exclude: DataFrame, on: list[str] | str
) -> DataFrame:
    """Negative-control exclusion (J4), parity AzGeneBurden.py:138-153."""
    return df.join(exclude, on=on, how="left_anti")


def enrich_join_back(
    df: DataFrame,
    key_cols: list[str],
    enrich_fn: Callable[[DataFrame], DataFrame],
    how: str = "left",
    broadcast: bool = True,
) -> DataFrame:
    """The distinct→enrich→join-back pattern (D9/D10), Spark-first.

    Reference shape (``common/ontology.py:43-94``): pull ``distinct`` key
    pairs to the driver, enrich via an external service (OnToma/GPT), re-enter
    Spark with ``createDataFrame``, then *null-safe* left join back on every
    key column, fanning evidence out when the enrichment is 1:N.

    ``enrich_fn`` receives the distinct-keys DataFrame and must return it with
    extra columns (it may go through pandas internally — that boundary is the
    caller's choice and is bounded by |distinct keys|, not |rows|).

    ``broadcast=True`` pins the broadcast hint — correct for LUT-sized
    keysets (the reference design point).  Pass ``broadcast=False`` for
    high-cardinality enrichment: the join falls back to
    :func:`broadcast_if_small`, so a keyset that outgrows the threshold
    degrades to a shuffle join instead of an executor OOM.
    """
    keys = df.select(*key_cols).distinct()
    enriched = enrich_fn(keys)
    cond = reduce(
        lambda a, b: a & b,
        [df[k].eqNullSafe(enriched[k]) for k in key_cols],
    )
    hinted = F.broadcast(enriched) if broadcast else broadcast_if_small(enriched)
    joined = df.join(hinted, on=cond, how=how)
    for k in key_cols:
        joined = joined.drop(enriched[k])
    return joined
