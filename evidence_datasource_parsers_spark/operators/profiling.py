"""Corpus and key-distribution profiling — the diagnostics that decide
partitioning strategy BEFORE a 100 TB job runs.

Both operators return tiny summary frames (rows ~ constants or top-N), so
they are safe to ``collect()``; the heavy lifting is one aggregation each,
map-side combined, with approximate distincts (HLL) instead of exact
count-distinct shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from evidence_datasource_parsers_spark.functions.textstats import (
    bpe_like_token_count,
    token_count,
)


def corpus_profile(
    df: DataFrame, text_col: str = "text", group_col: str | None = None
) -> DataFrame:
    """One-pass corpus summary: document counts, token/char mass and
    percentiles, approximate distinct documents (HLL on length+prefix) —
    per ``group_col`` when given (e.g. lang, domain), else one global row.

    This is the number sheet a mixing/dedup/packing decision reads: total
    token mass per domain feeds ``mixture_fractions``; p50/p99 length
    feeds ``chunk_tokens``; distinct-vs-total hints at the dup rate before
    any dedup pass runs."""
    toks = token_count(F.col(text_col))
    chars = F.length(F.col(text_col))
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(toks).alias("total_tokens"),
        F.sum(bpe_like_token_count(F.col(text_col))).alias("total_bpe_tokens"),
        F.sum(chars).alias("total_chars"),
        (F.sum(chars) / F.count(F.lit(1))).alias("mean_chars"),
        F.percentile_approx(
            chars, F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99))
        ).alias("chars_p50_p90_p99"),
        F.approx_count_distinct(F.md5(F.col(text_col))).alias(
            "approx_distinct_docs"
        ),
    ]
    if group_col is None:
        return df.agg(*aggs)
    return df.groupBy(group_col).agg(*aggs)


def key_skew_report(
    df: DataFrame, key: str | list[str], top_n: int = 20
) -> DataFrame:
    """Heavy-hitter report for a prospective shuffle key: the ``top_n``
    heaviest key values with their row counts and share of the total, plus
    the skew ratio (heaviest / mean rows-per-key) as a constant column.

    Read it BEFORE choosing a groupBy/join key at scale: a skew ratio in
    the hundreds means the hottest partition will straggle — salt that key
    (operators/skew.py) or pre-aggregate.  Cost: one count aggregation on
    the key (map-side combined) + a top-N heap; no full sort."""
    keys = [key] if isinstance(key, str) else list(key)
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("rows"))
    stats = counts.agg(
        F.sum("rows").alias("__total"),
        F.count(F.lit(1)).alias("__nkeys"),
        F.max("rows").alias("__max"),
    )
    top = counts.orderBy(F.col("rows").desc(), *keys).limit(top_n)
    return top.crossJoin(F.broadcast(stats)).select(
        *keys,
        "rows",
        (F.col("rows") / F.col("__total")).alias("share"),
        (F.col("__max") * F.col("__nkeys") / F.col("__total")).alias(
            "skew_ratio"
        ),
    )
