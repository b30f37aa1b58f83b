"""Cross-document repeated-passage removal.

Document-level dedup (exact/MinHash/SimHash — operators/dedupe.py) misses
the boilerplate that repeats INSIDE otherwise-unique documents: cookie
banners, license headers, navigation footers, templated intros.  Removing
passages that recur across the corpus is a standard training-data step
(suffix-array substring dedup is the exact formulation; passage-hash
removal is its scalable blocked approximation).

Spark-first shape — three narrow stages, every shuffle on an 8-byte hash:

  1. chunk each document into NON-overlapping token windows
     (operators/chunking.py with overlap=0 — overlap would double-count
     boundary text and delete more than the duplicated passage);
  2. count normalized passage hashes across the corpus (groupBy on the
     60-bit portable content hash — map-side combined, never the text);
  3. join the counts back on the hash and rebuild each document from the
     windows that fall under the threshold (groupBy doc, sort by window
     index, concat).

The passage-count table is usually tiny relative to the corpus (boilerplate
is by definition heavy-tailed), but it is NOT bounded — the join back uses
a plain equi-join and lets AQE pick broadcast vs shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from evidence_datasource_parsers_spark.operators.chunking import chunk_documents
from evidence_datasource_parsers_spark.operators.dedupe import content_hash


def repeated_passages(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    passage_tokens: int = 32,
    min_occurrences: int = 2,
) -> DataFrame:
    """Corpus-wide passage recurrence table: ``(passage_hash, n_docs,
    occurrences, sample_text)`` for every passage seen at least
    ``min_occurrences`` times — the audit view of what removal would cut."""
    chunks = chunk_documents(
        df, text_col=text_col, id_col=id_col,
        chunk_tokens=passage_tokens, overlap=0,
    ).where(F.col("chunk_token_count") > 0)
    return (
        chunks.select(
            id_col,
            F.col("chunk_text"),
            content_hash(F.col("chunk_text")).alias("passage_hash"),
        )
        .groupBy("passage_hash")
        .agg(
            F.count(F.lit(1)).alias("occurrences"),
            F.countDistinct(id_col).alias("n_docs"),
            F.min("chunk_text").alias("sample_text"),
        )
        .where(F.col("occurrences") >= min_occurrences)
    )


def remove_repeated_passages(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    passage_tokens: int = 32,
    min_occurrences: int = 2,
    min_distinct_docs: int = 2,
) -> DataFrame:
    """Rewrite each document with its corpus-recurrent passages removed.

    A window is cut when its normalized hash occurs ``min_occurrences``+
    times across the corpus AND in ``min_distinct_docs``+ distinct
    documents (the second condition protects a legitimately repetitive
    single document from self-deletion).  Output: ``(id_col, text_col)``
    with the surviving windows re-joined in order; a fully-boilerplate
    document survives as an empty string rather than disappearing.

    Window-boundary caveat (shared with every blocked approximation of
    suffix-array dedup): a duplicated passage straddling two windows is
    only removed if each straddled window independently crosses the
    threshold.  Smaller ``passage_tokens`` trades finer removal for more
    hash rows.
    """
    chunks = chunk_documents(
        df, text_col=text_col, id_col=id_col,
        chunk_tokens=passage_tokens, overlap=0,
    ).withColumn("passage_hash", content_hash(F.col("chunk_text")))
    bad = (
        chunks.where(F.col("chunk_token_count") > 0)
        .groupBy("passage_hash")
        .agg(
            F.count(F.lit(1)).alias("__occ"),
            F.countDistinct(id_col).alias("__docs"),
        )
        .where(
            (F.col("__occ") >= min_occurrences)
            & (F.col("__docs") >= min_distinct_docs)
        )
        .select("passage_hash", F.lit(True).alias("__cut"))
    )
    kept = (
        chunks.join(bad, on="passage_hash", how="left")
        .where(F.col("__cut").isNull())
        .groupBy(id_col)
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct("chunk_idx", "chunk_text")
                        )
                    ),
                    lambda s: s["chunk_text"],
                ),
            ).alias(text_col)
        )
    )
    # re-attach documents whose every window was cut (empty text)
    return (
        df.select(id_col)
        .join(kept, on=id_col, how="left")
        .select(id_col, F.coalesce(F.col(text_col), F.lit("")).alias(text_col))
    )
