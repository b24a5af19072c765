"""End-to-end pretraining prep composition: train BPE on the corpus,
tokenize with it, pack the tokenized lengths into fixed context
windows — the three stages wired together the way a deployment runs
them (tokenizer fit -> corpus tokenize -> sequence layout)."""

from __future__ import annotations

from pyspark.sql import functions as F

from jena_spark.data.bpe import bpe_tokens_col, train_bpe
from jena_spark.data.pack import pack_documents

DOCS = [
    (1, "the cat sat on the mat"),
    (2, "the cat ran"),
    (3, "a mat and a cat"),
    (4, "the the the cat cat"),
    (5, ""),
]


def _df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_train_tokenize_pack_composition(spark):
    docs = _df(spark)
    merges = train_bpe(docs, n_merges=12)
    assert merges  # learned something from 'the'/'cat' repetition

    tokenized = docs.select(
        "doc_id",
        F.size(bpe_tokens_col(F.col("text"), merges)).cast("bigint")
        .alias("n_bpe_tokens"))
    counts = {r["doc_id"]: r["n_bpe_tokens"] for r in tokenized.collect()}
    # BPE token count is bounded below by word count (merges only join
    # within words) and above by character count
    for i, text in DOCS:
        n_words = len(text.split())
        n_chars = sum(len(w) for w in text.split())
        assert n_words <= counts[i] <= max(n_chars, n_words), (i, counts)
    assert counts[5] == 0  # empty doc -> zero tokens

    packed = pack_documents(
        docs.join(tokenized, "doc_id"), context_len=8,
        n_tokens="n_bpe_tokens")
    rows = {r["doc_id"]: r for r in packed.collect()}
    # layout is ascending doc_id: offsets are the running BPE sums
    acc = 0
    for i, _ in DOCS:
        assert rows[i]["start_offset"] == acc
        assert rows[i]["n_tokens"] == counts[i]
        acc += counts[i]
    # chunk ids consistent with offsets
    for i, _ in DOCS:
        r = rows[i]
        assert r["chunk_first"] == r["start_offset"] // 8
        if counts[i] > 0:
            assert r["chunk_last"] == (r["start_offset"]
                                       + counts[i] - 1) // 8
