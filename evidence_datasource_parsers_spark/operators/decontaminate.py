"""Benchmark decontamination: find (and drop) training documents that
overlap an evaluation set.

The standard formulation: a training document is contaminated if it shares
any length-``n`` token n-gram with any evaluation document (GPT-3 used
13-grams; smaller n is stricter).  The eval side is benchmarks — thousands
of documents, not terabytes — so the scale shape is asymmetric by design:

  * eval n-grams hash to the portable 60-bit space and form a DISTINCT
    set that is broadcast (bounded by the benchmark suite, not the corpus);
  * corpus documents explode to their n-gram hashes (narrow: doc id +
    8-byte hash), and a broadcast left-semi join marks hits — the corpus
    is never shuffled, only scanned;
  * matched doc ids distinct-aggregate to the contamination list.

Normalization is STRICTER than the dedup family's (lowercase + collapse
whitespace): punctuation is stripped entirely, because contamination
typically survives reformatting ("France??" must still match "france") —
a missed dup costs storage, a missed contamination corrupts an eval.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from evidence_datasource_parsers_spark.functions.hashing import portable_hash
from evidence_datasource_parsers_spark.operators.joins import (
    broadcast_if_small,
)


def _decon_norm(c: Column) -> Column:
    """lowercase, strip everything but [a-z0-9], collapse whitespace."""
    return F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(c), r"[^a-z0-9\s]+", " "), r"\s+", " "
        )
    )


def ngram_hashes(
    df: DataFrame, text_col: str, id_col: str, n: int
) -> DataFrame:
    """(id, ngram_hash) — one row per token n-gram of the normalized text
    (gram construction shared with ``textstats.word_ngrams`` so the two
    never drift).  Documents shorter than ``n`` tokens contribute
    nothing."""
    from evidence_datasource_parsers_spark.functions.textstats import (
        word_ngrams,
    )

    grams = word_ngrams(_decon_norm(F.col(text_col)), n)
    return df.select(
        F.col(id_col), F.explode(grams).alias("__g")
    ).select(id_col, portable_hash(F.col("__g")).alias("ngram_hash"))


def find_contaminated(
    corpus: DataFrame,
    eval_set: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    eval_text_col: str | None = None,
    n: int = 8,
    fan_out: bool = False,
    min_eval_overlap: float | None = None,
) -> DataFrame:
    """Doc ids of contaminated corpus documents.

    Default rule (``min_eval_overlap=None``): contaminated = shares ≥1
    token ``n``-gram with any eval document.  One distinct over the
    (small) eval grams, one semi-join against the corpus grams, one
    distinct over matched ids — with ``fan_out=False`` (default) the
    corpus side never shuffles.

    ``min_eval_overlap=X`` (0 < X ≤ 1) switches to the overlap-fraction
    rule: contaminated = for SOME eval document, ≥ X of that eval doc's
    distinct grams appear in the corpus doc.  The ≥1-gram rule is
    aggressive for short n over boilerplate ("click here to subscribe"
    8-grams); the fraction rule only fires when a substantial part of an
    actual eval item is reproduced.  Scale shape: corpus grams are
    FIRST semi-join-filtered to eval matches (tiny), and only the
    matched slice is deduped, attributed to eval ids, and ratio-checked
    — the corpus-scale gram stream still never shuffles.

    The eval side is routed through :func:`broadcast_if_small` rather
    than a pinned broadcast: a benchmark suite broadcasts as always,
    while a pathological corpus-sized "eval set" degrades to a shuffle
    join instead of an executor OOM.

    ``fan_out`` optionally round-robins the corpus before the n-gram
    explode for few-partition sources.  Measured at sf0.1 local[32]: it
    speeds an ISOLATED gram materialization 2.6× (32s → 12s on a
    single-row-group file) but the full semi-join query ran FASTER
    without it (10–16s vs 19–22s, warm, interleaved) — the exchange and
    lost scan fusion outweigh the parallelism here.  Default off; flip it
    only after measuring on your actual layout."""
    if fan_out:
        corpus = corpus.repartition(
            corpus.sparkSession.sparkContext.defaultParallelism
        )
    eval_id = eval_set.columns[0]
    eval_grams = ngram_hashes(
        eval_set, eval_text_col or text_col, eval_id, n
    )
    corpus_grams = ngram_hashes(corpus, text_col, id_col, n)
    # gate every eval-side hint on the EVAL SET's own stats (the gram
    # stream has none — explode defeats Catalyst's estimator — but at
    # ~8 B/hash per text token it weighs the same order as the eval text)
    def gated(frame):
        return broadcast_if_small(frame, proxy=eval_set)

    if min_eval_overlap is None:
        gram_set = eval_grams.select("ngram_hash").distinct()
        return (
            corpus_grams.join(
                gated(gram_set), on="ngram_hash", how="left_semi"
            )
            .select(id_col)
            .distinct()
        )
    if not 0 < min_eval_overlap <= 1:
        raise ValueError(
            f"min_eval_overlap must be in (0, 1], got {min_eval_overlap}"
        )
    # per-eval-doc distinct grams + totals: eval-sized, both gated hints
    eg = eval_grams.select(
        F.col(eval_id).alias("__eid"), "ngram_hash"
    ).distinct()
    totals = eg.groupBy("__eid").agg(F.count(F.lit(1)).alias("__total"))
    matched = corpus_grams.join(
        gated(eg.select("ngram_hash").distinct()),
        on="ngram_hash",
        how="left_semi",
    )
    # only the matched slice (bounded by |eval grams| × dup rate) is
    # deduped and attributed — never the full corpus gram stream
    shared = (
        matched.distinct()
        .join(gated(eg), on="ngram_hash")
        .groupBy(id_col, "__eid")
        .agg(F.count(F.lit(1)).alias("__shared"))
    )
    return (
        shared.join(gated(totals), on="__eid")
        .filter(F.col("__shared") / F.col("__total") >= F.lit(min_eval_overlap))
        .select(id_col)
        .distinct()
    )


def decontaminate(
    corpus: DataFrame,
    eval_set: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    eval_text_col: str | None = None,
    n: int = 8,
    min_eval_overlap: float | None = None,
) -> DataFrame:
    """Corpus minus contaminated documents (left_anti on the hit list) —
    the drop-side twin of :func:`find_contaminated`."""
    hits = find_contaminated(
        corpus,
        eval_set,
        text_col,
        id_col,
        eval_text_col,
        n,
        min_eval_overlap=min_eval_overlap,
    )
    return corpus.join(hits, on=id_col, how="left_anti")


def semantic_decontaminate(
    corpus: DataFrame,
    eval_embeddings: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "doc_id",
    *,
    dim: int,
    threshold: float = 0.9,
    n_planes: int = 8,
    n_tables: int = 4,
    eval_bucket_rows: DataFrame | None = None,
):
    """Embedding-space eval-set decontamination — the SEMANTIC complement
    of the n-gram overlap gate above: a training document whose embedding
    lies within cosine ``threshold`` of ANY eval item is dropped, catching
    the paraphrased / translated / re-templated contamination that n-gram
    overlap structurally cannot see.

    This is deliberately a thin, documented reuse of the incremental
    embedding-store machinery (`similarity.incremental_embedding_dedupe`)
    with the EVAL SET as the store: candidates come from the shared
    multi-table hyperplane buckets (equi-join, never corpus × eval), and
    verification is exact cosine.  Recall follows the standard LSH trade
    (tune ``n_planes``/``n_tables``); exact re-ingests of eval items are
    always caught.  Pass ``eval_bucket_rows`` (persisted
    `hyperplane_bucket_rows` of the eval set) to amortize eval-side
    hashing across corpus shards — the eval set is tiny relative to the
    corpus, so the per-shard cost is the corpus-side bucketing alone.

    Returns ``(clean, pinned)``: surviving corpus rows (full payload) and
    the pinned bucket handle — unpersist after materializing ``clean``.
    """
    from evidence_datasource_parsers_spark.operators.similarity import (
        incremental_embedding_dedupe,
    )

    res = incremental_embedding_dedupe(
        corpus,
        eval_embeddings.select(
            F.col(id_col),
            F.col(vec_col).cast("array<double>").alias(vec_col),
        ),
        vec_col,
        id_col,
        dim=dim,
        threshold=threshold,
        n_planes=n_planes,
        n_tables=n_tables,
        store_bucket_rows=eval_bucket_rows,
    )
    return res.fresh, res.pinned
