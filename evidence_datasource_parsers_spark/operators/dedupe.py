"""Deduplication operators for training-data pipelines.

Exact (hash-groupBy), MinHash+LSH (shingle → minhash → band → bucket join),
SimHash, and n-gram Jaccard — all expressed with built-in DataFrame ops and
the *portable* md5-derived hash family (functions/hashing.py) so results are
reproducible across engines (and verifiable against the DuckDB oracle).

Scale design:
  * signatures are computed with higher-order array functions per row — no
    shuffle, no Python;
  * candidate generation shuffles on (band, band-hash) buckets, never on raw
    text; pair verification only touches bucket-mates;
  * everything is deterministic (fixed permutation family, fixed shingle
    width) so incremental re-runs dedupe consistently.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from evidence_datasource_parsers_spark.functions.hashing import (
    P_BASE,
    minhash_perm,
    portable_hash,
)


def normalized_text(col: Column | str) -> Column:
    """Canonical text form for hashing: lowercase, collapse whitespace."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")


def content_hash(col: Column | str) -> Column:
    """60-bit portable content hash of normalized text (fingerprint)."""
    return portable_hash(normalized_text(col))


def exact_dedupe(
    df: DataFrame, text_col: str, id_col: str, keep: str = "min"
) -> DataFrame:
    """Exact dedup: group by content hash, keep one representative id.

    One shuffle on the 60-bit hash — uniformly distributed, no skew.  At
    100 TB, hash first and group on the hash (8 bytes) rather than the text.
    """
    agg = F.min(F.col(id_col)) if keep == "min" else F.max(F.col(id_col))
    return (
        df.withColumn("__h", content_hash(text_col))
        .groupBy("__h")
        .agg(agg.alias(id_col), F.count(F.lit(1)).alias("dup_count"))
        .withColumnRenamed("__h", "content_hash")
    )


def char_shingles(col: Column | str, k: int = 5) -> Column:
    """k-character shingle set of normalized text, as array<string>.

    Built with sequence+transform (JVM-side); distinct to make it a set.
    """
    c = normalized_text(col)
    n = F.length(c)
    idx = F.sequence(F.lit(1), F.greatest(n - F.lit(k - 1), F.lit(1)))
    return F.array_distinct(F.transform(idx, lambda i: c.substr(i, F.lit(k))))


def minhash_signature(col: Column | str, num_perm: int = 16, k: int = 5) -> Column:
    """MinHash signature: array<long> of length num_perm.

    min over shingles of (A_i * base(shingle) + B_i) % P — computed entirely
    with higher-order functions, one pass over the shingle array per row.
    """
    bases = F.transform(
        char_shingles(col, k), lambda s: portable_hash(s) % F.lit(P_BASE)
    )
    return F.array(
        *[
            F.array_min(F.transform(bases, lambda b: minhash_perm(b, i)))
            for i in range(num_perm)
        ]
    )


def minhash_bands(sig_col: Column, num_perm: int, bands: int) -> Column:
    """Split a signature into LSH bands: array<struct<band:int, key:string>>."""
    rows_per_band = num_perm // bands
    return F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws(
                    "_",
                    *[
                        F.element_at(sig_col, b * rows_per_band + r + 1)
                        for r in range(rows_per_band)
                    ],
                ).alias("key"),
            )
            for b in range(bands)
        ]
    )


def lsh_candidate_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_perm: int = 16,
    bands: int = 4,
    k: int = 5,
) -> DataFrame:
    """MinHash-LSH near-dup candidates: (id_a, id_b) sharing >= 1 band bucket.

    Plan shape: signature (narrow) → explode bands (×bands) → groupBy bucket →
    pairs within bucket → distinct.  The shuffle key is (band, key) — small and
    uniform; no O(n²) comparisons outside buckets.
    """
    sig = df.select(
        F.col(id_col),
        minhash_bands(
            minhash_signature(text_col, num_perm, k), num_perm, bands
        ).alias("__bands"),
    )
    buckets = sig.select(
        id_col, F.explode("__bands").alias("b")
    ).select(id_col, F.col("b.band").alias("band"), F.col("b.key").alias("key"))
    left = buckets.alias("l")
    right = buckets.alias("r")
    pairs = (
        left.join(
            right,
            on=[
                F.col("l.band") == F.col("r.band"),
                F.col("l.key") == F.col("r.key"),
                F.col(f"l.{id_col}") < F.col(f"r.{id_col}"),
            ],
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
        )
        .distinct()
    )
    return pairs


def simhash(col: Column | str, nbits: int = 16) -> Column:
    """SimHash over whitespace tokens: nbits-wide integer fingerprint.

    bit_j(doc) = 1 iff sum over tokens of (+1 if hash(token) has bit j else -1)
    is positive.  Expressed as aggregate-HOFs; deterministic, engine-portable.
    """
    c = normalized_text(col)
    toks = F.array_distinct(F.split(c, " "))
    hashes = F.transform(toks, lambda t: portable_hash(t))
    bit_sums = [
        F.aggregate(
            hashes,
            F.lit(0).cast("long"),
            lambda acc, h: acc
            + F.when(F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        )
        for j in range(nbits)
    ]
    out = F.lit(0).cast("long")
    for j, s in enumerate(bit_sums):
        out = out + F.when(s > 0, F.lit(1 << j)).otherwise(F.lit(0)).cast("long")
    return out


def hamming_distance(a: Column, b: Column, nbits: int = 16) -> Column:
    """Popcount of XOR via bit_count (Spark >= 3.3)."""
    return F.bit_count(a.bitwiseXOR(b))


def ngram_jaccard(a: Column, b: Column, k: int = 5) -> Column:
    """Jaccard similarity of k-shingle sets of two text columns."""
    sa, sb = char_shingles(a, k), char_shingles(b, k)
    inter = F.size(F.array_intersect(sa, sb))
    union = F.size(F.array_union(sa, sb))
    return inter / union
