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


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Version diff between two corpus snapshots: (``id_col``, status)
    with status ∈ added | removed | changed | unchanged.

    The release-audit companion to the manifest checksums: the checksum
    says WHETHER two versions differ, this says WHERE.  One full-outer
    join on the id; comparison is on the portable 60-bit content hash
    (never the text), with NULL text hashing to a sentinel so
    NULL→'x' edits count as changed.  Aggregate the output for the
    summary counts; filter status != 'unchanged' for the release notes.
    """
    from evidence_datasource_parsers_spark.functions.hashing import (
        portable_hash,
    )

    def hashed(df, name):
        return df.select(
            F.col(id_col),
            F.coalesce(
                portable_hash(F.col(text_col)), F.lit(-1)
            ).alias(name),
        )

    o, n = hashed(old, "__oh"), hashed(new, "__nh")
    joined = o.join(n, on=id_col, how="full_outer")
    status = (
        F.when(F.col("__oh").isNull(), "added")
        .when(F.col("__nh").isNull(), "removed")
        .when(F.col("__oh") == F.col("__nh"), "unchanged")
        .otherwise("changed")
    )
    return joined.select(F.col(id_col), status.alias("status"))


def token_distribution_profile(
    df: DataFrame, text_col: str = "text", top_n: int = 1000
) -> DataFrame:
    """One-row token-distribution summary: vocabulary size, total token
    mass, the share held by the ``top_n`` heaviest tokens, and the Zipf
    exponent fitted over those top tokens.

    Natural language follows freq ∝ rank^s with s ≈ −1; a corpus whose
    fitted slope is far shallower is template/boilerplate-heavy (near-
    uniform token use — a dedup/quality red flag), far steeper means a
    few tokens dominate (log spam, repeated separators).  The slope is a
    cheap corpus-health number to trend across ingest batches.

    Plan shape: ONE shuffle on token (map-side combined counts), a
    vocab-sized scalar agg, a top-N heap (TakeOrderedAndProject — no full
    sort), then the log-log least-squares fit as an aggregation over the
    tiny top-N frame.  No driver-side math; safe to collect (1 row).
    """
    tok = df.select(
        F.explode(
            F.filter(
                F.split(F.col(text_col), r"\s+"), lambda t: t != F.lit("")
            )
        ).alias("token")
    )
    counts = tok.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("freq")
    )
    totals = counts.agg(
        F.count(F.lit(1)).alias("vocab_size"),
        F.sum("freq").alias("total_tokens"),
    )
    from pyspark.sql import Window

    top = counts.orderBy(F.col("freq").desc(), "token").limit(top_n)
    ranked = top.withColumn(
        "__r",
        F.row_number().over(
            Window.orderBy(F.col("freq").desc(), "token")
        ),
    )
    x = F.log(F.col("__r").cast("double"))
    y = F.log(F.col("freq").cast("double"))
    fit = ranked.agg(
        F.sum("freq").alias("top_tokens"),
        F.count(F.lit(1)).alias("__n"),
        F.sum(x).alias("__sx"),
        F.sum(y).alias("__sy"),
        F.sum(x * y).alias("__sxy"),
        F.sum(x * x).alias("__sxx"),
    )
    n = F.col("__n").cast("double")
    slope = (n * F.col("__sxy") - F.col("__sx") * F.col("__sy")) / (
        n * F.col("__sxx") - F.col("__sx") * F.col("__sx")
    )
    return fit.crossJoin(F.broadcast(totals)).select(
        "vocab_size",
        "total_tokens",
        (F.col("top_tokens") / F.col("total_tokens")).alias(
            "top_n_share"
        ),
        slope.alias("zipf_slope"),
    )


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
