"""Byte-pair-encoding tokenizer training and application.

The subword vocabulary learner of Sennrich, Haddow & Birch, *Neural
Machine Translation of Rare Words with Subword Units* (ACL 2016) — the
construction behind GPT-2/RoBERTa-style tokenizers — with the
architecture every production trainer uses at corpus scale
(HuggingFace ``tokenizers``, Google ``subword-nmt``):

1. **Word census** (distributed): one hash aggregation collapses the
   corpus to ``(word_type, count)``. This is the only pass that
   touches every token occurrence; everything after is bounded by the
   number of DISTINCT word types, not corpus size.
2. **Merge loop** (driver): classic BPE over the count-weighted word
   types. The word-type table is truncated to the ``max_word_types``
   most frequent types first (deterministic ``(count desc, word)``
   order) — the standard practical bound; at web scale the type table
   is Zipf-truncated exactly like this.
3. **Tokenization** (distributed, map-only): the learned merge ranks
   broadcast to executors; an Arrow-batched pandas UDF applies merges
   greedily by rank per word. Python is unavoidable here (an
   iterative data-dependent loop per word), so it is the one
   Arrow-batched hop; there is no shuffle.

Everything is deterministic: ties in pair frequency break
lexicographically, so the same corpus always yields the same merge
list, and tokenization is a pure function of (text, merges).
"""

from __future__ import annotations

from collections import Counter

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from jena_spark.data.text import tokens

#: end-of-word sentinel appended to every word's final symbol
#: (subword-nmt's ``</w>``) so merges can't cross word boundaries and
#: detokenization stays unambiguous.
EOW = "</w>"


def word_census(docs: DataFrame, text: str = "text") -> DataFrame:
    """``(word, n)`` — the corpus collapsed to distinct word types.
    One explode + one hash aggregation with map-side partial combine."""
    return (docs.where(F.length(F.trim(F.col(text))) > 0)
            .select(F.explode(tokens(F.col(text))).alias("word"))
            .groupBy("word").agg(F.count(F.lit(1)).alias("n")))


def _merge_word(sym: tuple[str, ...], pair: tuple[str, str]) -> tuple[str, ...]:
    out: list[str] = []
    i, n = 0, len(sym)
    while i < n:
        if i + 1 < n and sym[i] == pair[0] and sym[i + 1] == pair[1]:
            out.append(sym[i] + sym[i + 1])
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return tuple(out)


def train_bpe(docs: DataFrame, n_merges: int = 1000,
              max_word_types: int = 50_000,
              text: str = "text") -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus.

    Driver memory holds at most ``max_word_types`` word types (taken
    by descending count, word-lexicographic tie-break — deterministic
    truncation). Each round merges the most frequent adjacent symbol
    pair (count-weighted across types; lexicographic tie-break) and
    stops early when no pair occurs twice."""
    rows = (word_census(docs, text)
            .orderBy(F.col("n").desc(), "word")
            .limit(max_word_types).collect())
    vocab: dict[tuple[str, ...], int] = {}
    for r in rows:
        sym = tuple(r["word"][:-1]) + (r["word"][-1] + EOW,)
        vocab[sym] = vocab.get(sym, 0) + r["n"]

    # incremental pair maintenance (what subword-nmt/tokenizers do):
    # full count once, then per merge re-count only the word types
    # that actually contain the merged pair.
    pairs: Counter = Counter()
    where: dict[tuple[str, str], set[tuple[str, ...]]] = {}
    for sym, n in vocab.items():
        for p in zip(sym, sym[1:]):
            pairs[p] += n
            where.setdefault(p, set()).add(sym)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        if not pairs:
            break
        best = max(pairs.items(), key=lambda kv: (kv[1], _neg_lex(kv[0])))
        if best[1] < 2:
            break  # every remaining pair is a singleton — nothing to gain
        pair = best[0]
        merges.append(pair)
        for old in list(where.get(pair, ())):
            n = vocab.pop(old)
            new = _merge_word(old, pair)
            vocab[new] = vocab.get(new, 0) + n
            for p in zip(old, old[1:]):
                pairs[p] -= n
                if pairs[p] <= 0:
                    del pairs[p]
                s = where.get(p)
                if s is not None:
                    s.discard(old)
                    if not s:
                        del where[p]
            for p in zip(new, new[1:]):
                pairs[p] += n
                where.setdefault(p, set()).add(new)
    return merges


class _neg_lex:
    """Orders REVERSED lexicographically, so ``max`` by ``(count,
    _neg_lex(pair))`` picks the lexicographically SMALLEST pair among
    equal counts."""

    __slots__ = ("k",)

    def __init__(self, k):
        self.k = k

    def __lt__(self, other):  # self < other  <=>  self.k > other.k
        return self.k > other.k


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    sym = list(word[:-1]) + [word[-1] + EOW]
    while len(sym) > 1:
        best_rank, best_i = None, -1
        for i, pair in enumerate(zip(sym, sym[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        sym[best_i:best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def bpe_tokens_col(text: Column, merges: list[tuple[str, str]]) -> Column:
    """``array<string>`` of BPE tokens for a text column. Arrow-batched
    pandas UDF over the broadcast merge ranks — map-only, the single
    sanctioned Python hop of this module."""
    ranks = {tuple(p): i for i, p in enumerate(merges)}

    @F.pandas_udf(ArrayType(StringType()))
    def _enc(col: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}

        def one(t: str) -> list[str]:
            if t is None or not t.strip():
                return []
            out: list[str] = []
            for w in t.split():
                enc = cache.get(w)
                if enc is None:
                    enc = _encode_word(w, ranks)
                    cache[w] = enc
                out.extend(enc)
            return out

        return col.map(one)

    return _enc(text)


def bpe_token_stats(docs: DataFrame, merges: list[tuple[str, str]],
                    doc_id: str = "doc_id",
                    text: str = "text") -> DataFrame:
    """Per-document subword statistics: BPE token count, whitespace
    word count, and the fertility ratio (subwords per word — the
    standard tokenizer-quality metric; 1.0 = every word in-vocab)."""
    toks = bpe_tokens_col(F.col(text), merges)
    words = F.when(F.length(F.trim(F.col(text))) == 0, F.lit(0)) \
        .otherwise(F.size(tokens(F.col(text))))
    return docs.select(
        doc_id,
        F.size(toks).alias("n_bpe_tokens"),
        words.alias("n_words"),
    ).withColumn(
        "fertility",
        F.when(F.col("n_words") == 0, F.lit(0.0)).otherwise(
            F.round(F.col("n_bpe_tokens") / F.col("n_words"), 6)),
    )
