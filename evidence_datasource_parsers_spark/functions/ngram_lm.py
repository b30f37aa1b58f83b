"""Count-based n-gram language model: train distributed, score per-doc
perplexity — the CCNet-style quality filter (CommonCrawl pipelines score
documents against a clean-corpus LM and drop the high-perplexity tail).

All built-ins, no UDFs:

* **train**: ONE explode pass over the clean corpus → (context, word)
  counts (map-side combined, shuffle keyed by the n-gram — uniform), plus
  the context-marginal counts and vocabulary size derived from the same
  frame.  The model is a DataFrame, not a driver-side dict: vocabulary-
  sized, joinable, persistable with the bucketed-store sinks.
* **score**: explode the target corpus into its n-grams, LEFT join the
  model on (context, word) and the context marginals on context (both
  joins go through `broadcast_if_small` — n-gram models are usually
  broadcastable; a giant one degrades to a shuffle join, not an OOM),
  add-α smooth, sum log-probs per document.

Smoothing (add-α, stated exactly):

    p(w | ctx) = (c(ctx, w) + α) / (c(ctx) + α·V)

with c(·) = 0 for unseen pairs/contexts, V = training vocabulary size
(padding symbols included).  Documents are padded with n−1 BOS and one
EOS so every token is predicted exactly once; perplexity is
exp(−logprob / n_grams).

Float caveat, stated honestly: the per-doc sum of log-probs is a DOUBLE
aggregation and therefore partition-order dependent in the last ulps —
fine for filtering thresholds, NOT suitable for an exact value-hash gate
(the q11 Zipf leg shows the decimal-sum construction to use if exactness
is ever needed).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from evidence_datasource_parsers_spark.operators.joins import (
    broadcast_if_small,
)

BOS = "<s>"
EOS = "</s>"


def _tokens(text: Column, n: int) -> Column:
    """Lower-cased whitespace tokens padded with n−1 BOS and one EOS."""
    toks = F.filter(
        F.split(F.lower(text), r"\s+"), lambda t: t != F.lit("")
    )
    pad = F.array(*[F.lit(BOS)] * (n - 1))
    return F.concat(pad, toks, F.array(F.lit(EOS)))


def _ngrams(text: Column, n: int) -> Column:
    """array<struct<ctx,word>> of the document's n-grams (ctx = the n−1
    preceding tokens joined by a space; empty string for unigrams)."""
    toks = _tokens(text, n)
    idx = F.sequence(F.lit(n), F.size(toks))  # 1-based position of `word`
    return F.transform(
        idx,
        lambda i: F.struct(
            F.concat_ws(
                " ", F.slice(toks, i - (n - 1), n - 1)
            ).alias("ctx"),
            F.element_at(toks, i).alias("word"),
        ),
    )


def train_ngram_lm(df: DataFrame, text_col: str, n: int = 2) -> DataFrame:
    """(ctx, word, c) counts over the clean corpus — the model frame."""
    if n < 1:
        raise ValueError("n must be >= 1")
    g = df.select(F.explode(_ngrams(F.col(text_col), n)).alias("g"))
    return g.groupBy(
        F.col("g.ctx").alias("ctx"), F.col("g.word").alias("word")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))


def lm_vocab_size(lm: DataFrame) -> int:
    """V for the smoothing denominator: distinct predicted words (EOS
    included, BOS excluded — BOS is never predicted)."""
    return lm.select("word").distinct().count()


def doc_perplexity(
    df: DataFrame,
    lm: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 2,
    alpha: float = 1.0,
    vocab_size: int | None = None,
) -> DataFrame:
    """Per-doc (``id_col``, n_grams, logprob, perplexity) under the model.

    Two left joins — (ctx, word) against the model, ctx against its
    marginals — both size-gated broadcasts; unseen pairs/contexts fall
    back to the add-α floor.  NULL/empty text yields a single EOS
    prediction, never a dropped row.

    The model is persisted here: ``lm`` feeds THREE consumers (the vocab
    count, the pair join, the context marginals) and its lineage is the
    training-corpus scan — without caching, scoring would re-tokenize the
    clean corpus three times (the same no-subplan-sharing hazard
    term_relevance guards against).
    """
    lm = lm.persist()
    if vocab_size is None:
        vocab_size = lm_vocab_size(lm)
    v = float(vocab_size)
    ctx_tot = lm.groupBy("ctx").agg(F.sum("c").cast("long").alias("c_ctx"))
    g = df.select(
        F.col(id_col),
        F.explode(
            _ngrams(F.coalesce(F.col(text_col), F.lit("")), n)
        ).alias("g"),
    ).select(
        id_col, F.col("g.ctx").alias("ctx"), F.col("g.word").alias("word")
    )
    joined = (
        g.join(broadcast_if_small(lm), on=["ctx", "word"], how="left")
        .join(broadcast_if_small(ctx_tot), on="ctx", how="left")
        .select(
            F.col(id_col),
            (
                F.log(
                    (F.coalesce(F.col("c"), F.lit(0)).cast("double") + alpha)
                    / (
                        F.coalesce(F.col("c_ctx"), F.lit(0)).cast("double")
                        + alpha * v
                    )
                )
            ).alias("lp"),
        )
    )
    out = joined.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_grams"),
        F.sum("lp").alias("logprob"),
    )
    return out.select(
        id_col,
        "n_grams",
        "logprob",
        F.exp(-F.col("logprob") / F.col("n_grams")).alias("perplexity"),
    )
