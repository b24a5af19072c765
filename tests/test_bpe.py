"""BPE tokenizer training/application (``jena_spark/data/bpe.py``).

The incremental-pair-maintenance trainer must match a naive
recount-from-scratch reference (same tie-break rules, independent code
path), per Sennrich et al. (ACL 2016) semantics."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from jena_spark.data.bpe import (
    EOW,
    _merge_word,
    bpe_token_stats,
    bpe_tokens_col,
    train_bpe,
    word_census,
)

CORPUS = [
    ("d1", "low low low low low lower lower newest newest newest"),
    ("d2", "newest newest newest widest widest widest the the the the"),
    ("d3", "the quick brown fox jumped over the lazy dog"),
    ("d4", "lowering the newest widest quick quick brown brown"),
]


def _naive_train(word_counts: dict[str, int], n_merges: int):
    vocab = {}
    for w, n in word_counts.items():
        sym = tuple(w[:-1]) + (w[-1] + EOW,)
        vocab[sym] = vocab.get(sym, 0) + n
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for sym, n in vocab.items():
            for p in zip(sym, sym[1:]):
                pairs[p] += n
        if not pairs:
            break
        # max count, lexicographically smallest pair on ties
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        merges.append(best[0])
        vocab = {_merge_word(s, best[0]): n for s, n in vocab.items()}
    return merges


def test_trainer_matches_naive_reference(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id string, text string")
    counts = {r["word"]: r["n"] for r in word_census(docs).collect()}
    got = train_bpe(docs, n_merges=40)
    assert got == _naive_train(counts, 40)
    # deterministic across runs
    assert got == train_bpe(docs, n_merges=40)


def test_known_first_merges(spark):
    # newest(6) + widest(3): 'es' is the most frequent pair (9)
    docs = spark.createDataFrame(CORPUS[:2], "doc_id string, text string")
    merges = train_bpe(docs, n_merges=3)
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t" + EOW)


def test_tokenize_roundtrip_and_vocab_words(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id string, text string")
    counts = {r["word"]: r["n"] for r in word_census(docs).collect()}
    merges = train_bpe(docs, n_merges=200)  # to convergence
    out = docs.select(
        "doc_id", "text", bpe_tokens_col(F.col("text"), merges).alias("t"))
    for r in out.collect():
        # stripping EOW and joining reconstructs the original words
        rebuilt = "".join(tok for tok in r["t"]).replace(EOW, " ").strip()
        assert rebuilt == " ".join(r["text"].split())
    # trained to convergence, every word seen >= 2 times is ONE token
    # (hapax words never merge: min pair frequency is 2, the standard
    # min_frequency default)
    from jena_spark.data.bpe import _encode_word

    ranks = {p: i for i, p in enumerate(merges)}
    for w, n in counts.items():
        if n >= 2:
            assert _encode_word(w, ranks) == [w + EOW], w


def test_oov_words_split_into_subwords(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id string, text string")
    merges = train_bpe(docs, n_merges=200)
    oov = spark.createDataFrame(
        [("x", "lowest")], "doc_id string, text string")
    (row,) = oov.select(bpe_tokens_col(F.col("text"), merges).alias("t")).collect()
    assert len(row["t"]) > 1                    # OOV word splits
    assert "".join(row["t"]) == "lowest" + EOW  # losslessly


def test_token_stats(spark):
    docs = spark.createDataFrame(
        CORPUS + [("d5", "   ")], "doc_id string, text string")
    merges = train_bpe(docs, n_merges=5)  # few merges -> fertility > 1
    stats = {r["doc_id"]: r for r in bpe_token_stats(docs, merges).collect()}
    assert stats["d5"]["n_bpe_tokens"] == 0 and stats["d5"]["fertility"] == 0.0
    r = stats["d3"]
    assert r["n_words"] == 9 and r["n_bpe_tokens"] >= 9
    assert r["fertility"] == round(r["n_bpe_tokens"] / r["n_words"], 6)
