"""Trained character-n-gram language identification.

The third and sharpest tier of the lang-ID ladder (above the
Unicode-script tier and the stopword tier in ``functions/textstats.py``):
script-ID separates writing systems but every Latin-script language — the
majority of web text — falls through to six stopword lists.  This tier is
the standard cheap answer (a fastText/langid.py-style linear model over
character n-grams): a multinomial Naive Bayes on HASHED char n-grams,
trained and applied as pure DataFrame aggregation — the multiclass
sibling of ``functions/quality.train_quality_classifier`` (same
explode → bucket → groupBy shape, same integer-weight export contract).

Model shape: a DENSE ``(bucket, lang, weight)`` table over every bucket
seen in training × every training language — at 4096 buckets × 50
languages that is ~200k rows, a few MB, broadcast at inference — plus
one FLOOR row per language at the sentinel ``bucket = -1`` (real
buckets are non-negative) carrying the smoothed out-of-vocabulary
log-probability ``log(alpha / (tot_lang + alpha·n_buckets))``.  Dense
matters for correctness: log-probabilities are NEGATIVE, so a sparse
table whose missing entries defaulted to 0 would hand every unseen
(bucket, lang) pair the BEST possible score and wreck the argmax.  The
floor rows matter for the same reason one level up: a bucket absent
from the table is NOT language-neutral — its true NB contribution is
the per-language floor, which depends on the language's training-corpus
size (for a 10M-gram vs a 100k-gram language the floors differ by
~log(100)) — so inference scores every unmatched gram with the floor
instead of skipping it.  (A floor-less legacy table degrades to the old
skip behavior.)

Determinism contract (same as the quality tier): weights are integers
(scaled log-probabilities, half-up-quantized); per-document accumulation
is an integer sum; ties in the argmax break on the lexicographically
SMALLEST language code via one ``min_by`` over a (negated-score, lang)
struct — no floating-point accumulation order anywhere.

Scale shape: training is one explode + one ``groupBy(bucket, lang)``
shuffle (map-side combined) + a langs-sized broadcast cross join to
densify + two in-plan 1-row broadcast scalars (class totals ride the
counts; the integer normalizer is a 1-row agg) — no driver collect.
Inference is one explode + one broadcast join + one two-stage
aggregation keyed on the unique document id.  The class prior is
deliberately omitted: with n-grams per document in the hundreds the
likelihood term dominates, and dropping the prior keeps the weight table
the only model state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from evidence_datasource_parsers_spark.functions.hashing import portable_hash

__all__ = [
    "char_ngrams",
    "classify_language",
    "train_langid_classifier",
]

# integer weight scale — same contract as quality.WEIGHT_SCALE but wider:
# log-prob RANGES (not ratios) quantize here, so more headroom costs
# nothing and preserves ordering through long documents (5e5 grams ×
# 1e4 max weight stays < 2^33, far inside int64)
LANGID_SCALE = 10_000


def char_ngrams(col: Column | str, n: int = 3) -> Column:
    """Array of overlapping character ``n``-grams of the normalized text
    (lowercased, whitespace collapsed to single spaces — word boundaries
    ARE signal for language ID, so spaces stay in the grams).  Pure
    column expression: sequence + transform/substr, whole-stage codegen,
    no UDF.  Shorter-than-``n`` texts yield an empty array."""
    from evidence_datasource_parsers_spark.operators.dedupe import (
        normalized_text,
    )

    t = normalized_text(col)
    # sequence(1, 0) would DESCEND ([1, 0]); guard short texts explicitly
    return F.when(
        F.length(t) >= n,
        F.transform(
            F.sequence(F.lit(1), F.length(t) - (n - 1)),
            lambda i: t.substr(i, F.lit(n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _gram_bucket(n_buckets: int, salt: str) -> Column:
    """Hashing-trick bucket of the exploded ``__gram`` column."""
    return (
        portable_hash(F.concat(F.col("__gram"), F.lit(f":{salt}")))
        % n_buckets
    ).cast("long")


def _ns_tuple(n) -> tuple:
    return (n,) if isinstance(n, int) else tuple(n)


def _gram_frame(df, text_col, keep_cols, ns, n_buckets, salt):
    """Exploded (keep_cols..., bucket, __fb) frame over the union of the
    requested gram orders.  Multi-n models give each order its own
    DISJOINT bucket range (``n·n_buckets + hash``) — bucketing conflates
    gram identity, so without the offset a 2-gram and a 3-gram landing in
    one bucket would pool their counts — and its own floor sentinel
    ``__fb = -n`` (single-n keeps the legacy ``[0, n_buckets)`` range and
    ``-1`` sentinel, so existing trained tables stay valid)."""
    multi = len(ns) > 1
    frames = []
    for n in ns:
        b = _gram_bucket(n_buckets, salt)
        if multi:
            b = b + F.lit(n * n_buckets)
        fb = -n if multi else -1
        frames.append(
            df.select(
                *keep_cols,
                F.explode(char_ngrams(F.col(text_col), n)).alias("__gram"),
            )
            .where(F.length("__gram") == n)
            .select(
                *keep_cols,
                b.alias("bucket"),
                F.lit(fb).cast("long").alias("__fb"),
            )
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def train_langid_classifier(
    df: DataFrame,
    text_col: str,
    lang_col: str,
    n: int = 3,
    n_buckets: int = 4096,
    salt: str = "langid",
    alpha: float = 1.0,
) -> DataFrame:
    """Train the dense ``(bucket, lang, weight)`` table from labelled
    text (``lang_col`` = language code).  Per (bucket, lang) the weight
    is the add-``alpha`` smoothed ``log P(bucket | lang)``, rescaled by
    the table-wide max magnitude to ±LANGID_SCALE and half-up-quantized
    to an integer — a positive rescale of every log-prob, so the
    per-document argmax is exactly the NB likelihood argmax.

    Buckets seen in SOME language get a row for EVERY language (the
    dense contract the module doc explains); buckets never seen in ANY
    language are scored at inference with the per-language FLOOR rows
    this table carries at ``bucket = -1`` — the floor is the add-alpha
    zero-count log-probability, which differs across languages with
    different corpus sizes, so skipping unseen buckets would NOT be
    argmax-invariant.  Training languages are whatever distinct values
    ``lang_col`` holds — 20 or 200, the shuffle shape is the same.

    ``n`` may be a tuple (e.g. ``(2, 3)``): the model becomes a union of
    per-order NB likelihoods — each order gets a disjoint bucket range
    and its OWN floor row (sentinel ``bucket = -n``), because the
    zero-count log-probability depends on that order's per-language gram
    totals.  Bigrams generalize where trigram evidence is thin (short or
    code-switched text); the table contract is unchanged —
    ``(bucket, lang, weight)`` plus negative-bucket floors."""
    ns = _ns_tuple(n)
    grams = _gram_frame(
        df.select(F.col(lang_col).alias("lang"), F.col(text_col)),
        text_col, [F.col("lang")], ns, n_buckets, salt,
    )
    counts = grams.groupBy("bucket", "__fb", "lang").agg(
        F.count(F.lit(1)).alias("__c")
    )
    # NB denominators are PER ORDER: each order's per-language gram
    # total (+ alpha · its own bucket-space size)
    lang_totals = counts.groupBy("lang", "__fb").agg(
        F.sum("__c").alias("__tot")
    )
    buckets = counts.select("bucket", "__fb").distinct()
    logp_of = F.log(
        (F.coalesce(F.col("__c"), F.lit(0)) + F.lit(float(alpha)))
        / (F.col("__tot") + F.lit(float(alpha) * n_buckets))
    )
    dense = (
        buckets.join(F.broadcast(lang_totals), on="__fb")
        .join(counts, on=["bucket", "__fb", "lang"], how="left")
        .select("bucket", "lang", logp_of.alias("__logp"))
    )
    floors = (
        lang_totals.withColumn("__c", F.lit(None).cast("long"))
        .withColumn("bucket", F.col("__fb"))
        .select("bucket", "lang", logp_of.alias("__logp"))
    )
    allrows = dense.unionByName(floors)
    # normalizer over dense AND floor rows: a floor can exceed every
    # in-table magnitude when no trained bucket has a zero count
    norm = allrows.agg(F.max(F.abs(F.col("__logp"))).alias("__m"))
    return allrows.crossJoin(F.broadcast(norm)).select(
        "bucket",
        "lang",
        F.floor(
            F.col("__logp") / F.col("__m") * F.lit(float(LANGID_SCALE))
            + F.lit(0.5)
        ).cast("long").alias("weight"),
    )


def classify_language(
    df: DataFrame,
    weights: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    n_buckets: int = 4096,
    salt: str = "langid",
    out_col: str = "lang",
) -> DataFrame:
    """Assign each document the argmax-likelihood training language:
    explode char n-grams → bucket → broadcast-join the dense weight
    table → integer sum per (doc, lang), PLUS the per-language floor
    weight (the table's ``bucket = -1`` rows) for every gram whose
    bucket the table lacks — true NB scores out-of-vocabulary grams
    with the language's own zero-count floor, which differs across
    languages with unequal corpus sizes — → argmax (ties to the
    smallest language code).  Documents whose grams hit NO trained
    bucket (empty text, or fully out-of-distribution) get a NULL
    ``out_col`` — honest abstention, same convention as the stopword
    tier: all-floor scores would just crown the smallest training
    corpus.  A legacy floor-less table degrades to the pre-floor
    skip-unmatched behavior (floor weight coalesces to 0).

    The hash parameters (``n``, ``n_buckets``, ``salt``) MUST match
    training — they are part of the model identity (including tuple
    ``n`` for multi-order models, whose floors live at ``bucket = -n``
    per order)."""
    ns = _ns_tuple(n)
    bucketed = _gram_frame(
        df.select(F.col(id_col), F.col(text_col)),
        text_col, [F.col(id_col)], ns, n_buckets, salt,
    )
    floors = weights.where(F.col("bucket") < 0).select(
        F.col("bucket").alias("__fb"), "lang",
        F.col("weight").alias("__fw"),
    )
    table = weights.where(F.col("bucket") >= 0)
    # __m counts matched grams per order — identical across languages
    # (the table is dense per order), so __g − __m is the doc's
    # out-of-vocabulary gram count in that order's space
    per_lang = (
        bucketed.join(F.broadcast(table), on="bucket")
        .groupBy(id_col, "__fb", "lang")
        .agg(
            F.sum("weight").alias("__s"),
            F.count(F.lit(1)).alias("__m"),
        )
    )
    doc_grams = bucketed.groupBy(id_col, "__fb").agg(
        F.count(F.lit(1)).alias("__g")
    )
    # scaffold = (doc × lang × order): a doc that matched ANY order must
    # still pay every language's OOV floor in the orders it matched
    # nothing in — skipping those rows would drop a language-dependent
    # term from the NB sum.  Orders are plan-time literals, so the
    # scaffold is one generator expression, not a join.
    fbs = [-n_ for n_ in ns] if len(ns) > 1 else [-1]
    cand = per_lang.select(id_col, "lang").distinct()
    scaffold = cand.select(
        F.col(id_col), "lang",
        F.explode(
            F.array(*[F.lit(fb).cast("long") for fb in fbs])
        ).alias("__fb"),
    )
    scored = (
        scaffold.join(per_lang, on=[id_col, "lang", "__fb"], how="left")
        .join(doc_grams, on=[id_col, "__fb"], how="left")
        .join(F.broadcast(floors), on=["lang", "__fb"], how="left")
        .select(
            F.col(id_col),
            "lang",
            (
                F.coalesce(F.col("__s"), F.lit(0))
                + (
                    F.coalesce(F.col("__g"), F.lit(0))
                    - F.coalesce(F.col("__m"), F.lit(0))
                )
                * F.coalesce(F.col("__fw"), F.lit(0))
            ).alias("__s"),
        )
        .groupBy(id_col, "lang")
        .agg(F.sum("__s").alias("__s"))
    )
    best = scored.groupBy(id_col).agg(
        F.min_by(
            F.col("lang"), F.struct((-F.col("__s")).alias("ns"), "lang")
        ).alias(out_col),
        F.max(F.col("__s")).alias(f"{out_col}_score"),
    )
    return df.join(best, on=id_col, how="left")
