"""Document chunking: split long texts into overlapping token windows.

The precursor to sequence packing (catalog q51): a corpus of arbitrarily
long documents becomes fixed-budget training chunks with ``overlap`` tokens
of context carried across boundaries.  Entirely native — tokenize once,
``sequence`` over window starts, ``slice`` + ``concat_ws`` per window,
``posexplode`` to rows — so it's a narrow per-row fan-out with no Python
and no shuffle, and Catalyst prunes it like any projection.

At 100 TB chunking is embarrassingly parallel; the only scale caveat is
output row count (docs × windows), which downstream repartitioning or the
q51 packer absorbs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 128,
    overlap: int = 16,
) -> DataFrame:
    """One row per (doc, window): ``(id_col, chunk_idx, chunk_text,
    chunk_token_count)``.  Windows advance by ``chunk_tokens - overlap``;
    the final window keeps its tail even when shorter.  Empty/null texts
    produce one empty chunk so no document silently disappears."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"need 0 <= overlap < chunk_tokens, got {overlap}/{chunk_tokens}"
        )
    step = chunk_tokens - overlap
    toks = F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+")
    n = F.size(toks)
    # window starts: 0, step, 2*step, … while start < n (at least one)
    n_windows = F.greatest(
        F.lit(1), F.ceil((n - F.lit(overlap)) / F.lit(step)).cast("int")
    )
    starts = F.sequence(F.lit(0), (n_windows - 1) * step, F.lit(step))
    chunks = F.transform(
        starts, lambda s: F.concat_ws(" ", F.slice(toks, s + 1, chunk_tokens))
    )
    return (
        df.withColumn("__chunks", chunks)
        .select(
            id_col,
            F.posexplode("__chunks").alias("chunk_idx", "chunk_text"),
        )
        .withColumn(
            "chunk_token_count",
            F.when(F.length("chunk_text") == 0, 0).otherwise(
                F.size(F.split(F.col("chunk_text"), r"\s+"))
            ),
        )
    )
