"""Byte-pair-encoding tokenization: learn merges, apply them distributed.

``bpe_like_token_count`` (textstats.py) estimates; this module RUNS a real
BPE — the difference matters when token budgets drive packing (q51),
pricing, or curriculum decisions.

Two-phase design, mirroring how production BPE learners actually work:

* **learn_bpe_merges** — BPE training operates on the WORD-FREQUENCY
  table, not the corpus: one distributed pass folds 100 TB of text into a
  vocabulary-sized (word, count) dict, and the merge loop then runs
  driver-side over that dict (the same shape as GPT-2's / sentencepiece's
  trainers).  The driver holds O(|vocab|) — bounded by the language, not
  the corpus — and the loop does zero Spark actions.  A ``max_vocab``
  guard refuses to collect a pathological vocabulary instead of OOMing.

* **apply_bpe / bpe_token_count** — an Arrow-batched pandas UDF applying
  the learned ranks greedily (lowest rank first, GPT-2 style).  Merges
  broadcast once per executor via closure capture; a per-batch memo dict
  exploits Zipf's law (most words repeat), so the per-row cost collapses
  to a dict hit for all but the first occurrence of each word.

Word boundaries are whitespace; end-of-word is marked with ``</w>`` so
merges never cross words.  Unknown characters pass through as singleton
tokens — no vocab filtering here (that's a separate policy).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

EOW = "</w>"


def word_frequencies(df: DataFrame, text_col: str) -> DataFrame:
    """(word, n) over whitespace-split text — the corpus-collapsing pass."""
    return (
        df.select(
            F.explode(
                F.filter(
                    F.split(F.col(text_col), r"\s+"),
                    lambda t: t != F.lit(""),
                )
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def _merge_word(symbols: tuple[str, ...], pair: tuple[str, str]) -> tuple[str, ...]:
    out: list[str] = []
    i, n = 0, len(symbols)
    while i < n:
        if i < n - 1 and symbols[i] == pair[0] and symbols[i + 1] == pair[1]:
            out.append(pair[0] + pair[1])
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return tuple(out)


def learn_bpe_merges(
    df: DataFrame,
    text_col: str,
    n_merges: int,
    max_vocab: int = 5_000_000,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` merge rules from the corpus.

    Ties on pair count break lexicographically (smallest pair wins) so the
    learned table is deterministic across partitionings and engines.
    """
    freq_rows = word_frequencies(df, text_col).limit(max_vocab + 1).collect()
    if len(freq_rows) > max_vocab:
        raise ValueError(
            f"vocabulary exceeds max_vocab={max_vocab}; learning on the "
            "driver would be unbounded — sample the corpus or raise the cap"
        )
    vocab: dict[tuple[str, ...], int] = {}
    for r in freq_rows:
        vocab[tuple(r.word) + (EOW,)] = r.n
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, n in vocab.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + n
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        vocab = {_merge_word(s, best): n for s, n in vocab.items()}
    return merges


def _encoder(merges: list[tuple[str, str]]):
    ranks = {pair: i for i, pair in enumerate(merges)}

    def encode_word(word: str, memo: dict) -> list[str]:
        got = memo.get(word)
        if got is not None:
            return got
        syms = list(word) + [EOW]
        while len(syms) > 1:
            best_rank, best_i = None, -1
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_rank is None:
                break
            syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
        memo[word] = syms
        return syms

    return encode_word


def apply_bpe(merges, text: Column | str) -> Column:
    """``array<string>`` of BPE tokens for a text column (greedy
    lowest-rank-first application of the learned merges).

    ``merges`` is the learned list OR a ``SparkContext.broadcast`` of it —
    pass a broadcast for production-sized tables (tens of thousands of
    merges) so the ranks ship to each executor once instead of riding in
    every task closure.
    """
    is_bc = hasattr(merges, "value")  # pyspark Broadcast duck-type
    encode_word = None if is_bc else _encoder(merges)
    worker_cache: dict = {}  # broadcast path: one rank dict per worker

    @pandas_udf("array<string>")
    def _encode(s: pd.Series) -> pd.Series:
        enc = encode_word
        if enc is None:
            enc = worker_cache.get("e")
            if enc is None:
                enc = worker_cache["e"] = _encoder(merges.value)
        memo: dict = {}
        out = []
        for text_val in s:
            if text_val is None:
                out.append(None)
                continue
            toks: list[str] = []
            for w in text_val.split():
                toks.extend(enc(w, memo))
            out.append(toks)
        return pd.Series(out)

    col = F.col(text) if isinstance(text, str) else text
    return _encode(col)


def bpe_token_count(merges, text: Column | str) -> Column:
    """Exact token count under the learned BPE — the budget number.
    Accepts the merges list or its broadcast, as :func:`apply_bpe`."""
    return F.size(apply_bpe(merges, text)).cast("long")
