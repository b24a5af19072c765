"""Data selection + packing ops (``data/selection.py``,
``data/pack.py``)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from jena_spark.data.pack import pack_documents  # noqa: E402
from jena_spark.data.selection import (  # noqa: E402
    cap_per_source,
    importance_weights,
    stratified_sample,
)


def _docs(spark, n=400):
    rows = [(i, "en" if i % 2 == 0 else "de",
             ("the cat sat on the mat " * 3) if i % 2 == 0
             else ("der hund lief im park " * 3)) for i in range(n)]
    return spark.createDataFrame(
        rows, "doc_id long, lang string, text string")


def test_stratified_sample_rates_and_determinism(spark):
    d = _docs(spark)
    out = stratified_sample(d, {"en": 1.0, "de": 0.5}, source_col="lang")
    got = out.groupBy("lang").count().collect()
    by = {r.lang: r["count"] for r in got}
    assert by["en"] == 200  # rate 1.0 keeps everything
    assert 60 <= by.get("de", 0) <= 140  # ~100 expected, md5-uniform
    # deterministic: identical subset on re-run
    ids1 = sorted(r.doc_id for r in out.collect())
    ids2 = sorted(r.doc_id for r in stratified_sample(
        d, {"en": 1.0, "de": 0.5}, source_col="lang").collect())
    assert ids1 == ids2
    # absent source = rate 0; salt changes the subset
    assert stratified_sample(d, {"en": 1.0}, source_col="lang") \
        .where(F.col("lang") == "de").count() == 0
    salted = sorted(r.doc_id for r in stratified_sample(
        d, {"en": 1.0, "de": 0.5}, source_col="lang", salt="v2").collect())
    assert salted != ids1


def test_pack_documents_layout(spark):
    rows = [(0, "a b c"), (1, "d e"), (2, "f g h i"), (3, "j")]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in pack_documents(d, context_len=4).collect()}
    # offsets are the exact concatenation layout: 3,2,4,1 tokens
    assert [out[i].start_offset for i in range(4)] == [0, 3, 5, 9]
    assert [out[i].n_tokens for i in range(4)] == [3, 2, 4, 1]
    # doc0 sits in chunk 0; doc1 straddles tokens 3..4 -> chunks 0-1;
    # doc2 tokens 5..8 -> chunks 1-2; doc3 token 9 -> chunk 2
    assert (out[0].chunk_first, out[0].chunk_last) == (0, 0)
    assert (out[1].chunk_first, out[1].chunk_last) == (0, 1)
    assert (out[2].chunk_first, out[2].chunk_last) == (1, 2)
    assert (out[3].chunk_first, out[3].chunk_last) == (2, 2)


def test_pack_partitioned_streams(spark):
    rows = [(0, "s0", "a b"), (1, "s1", "c d e"), (2, "s0", "f"),
            (3, "s1", "g h")]
    d = spark.createDataFrame(rows, "doc_id long, src string, text string")
    out = {r.doc_id: r for r in pack_documents(
        d, context_len=2, partition_cols=["src"]).collect()}
    # each source packs its own stream from offset 0
    assert out[0].start_offset == 0 and out[2].start_offset == 2
    assert out[1].start_offset == 0 and out[3].start_offset == 3


def test_pack_two_pass_equals_window(spark):
    """The distributed prefix-sum path (num_partitions=N) is
    row-identical to the single-window path — boundary-invariant by
    construction."""
    import random

    rng = random.Random(7)
    rows = [(i, "w " * rng.randint(1, 30)) for i in range(311)]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(map(tuple, pack_documents(d, context_len=64).collect()))
    b = sorted(map(tuple, pack_documents(
        d, context_len=64, num_partitions=7).collect()))
    assert a == b


def test_importance_weights_favor_target(spark):
    d = _docs(spark, n=40)
    target = d.where(F.col("lang") == "en").select("text")
    out = {r.doc_id: r.score_unats for r in
           importance_weights(d, target, n=1, buckets=64).collect()}
    assert len(out) == 40
    en = [out[i] for i in range(40) if i % 2 == 0]
    de = [out[i] for i in range(40) if i % 2 == 1]
    # every English doc outscores every German doc against an
    # English-only target (disjoint vocabularies)
    assert min(en) > max(de)


def test_cap_per_source_quota_and_salt_invariance(spark):
    # skewed sources: one hot (300 rows), one small (7), one tiny (2)
    rows = ([(i, "hot") for i in range(300)]
            + [(1000 + i, "small") for i in range(7)]
            + [(2000 + i, "tiny") for i in range(2)])
    d = spark.createDataFrame(rows, "doc_id long, source string")
    out = cap_per_source(d, 10, id_col="doc_id")
    by = {r.source: r["count"]
          for r in out.groupBy("source").count().collect()}
    assert by == {"hot": 10, "small": 7, "tiny": 2}
    # the two-phase salted ranking is row-identical across fan-outs
    # (and to the single-window formulation, salt_buckets=1)
    base = sorted(map(tuple, cap_per_source(
        d, 10, salt_buckets=1).collect()))
    for sb in (4, 16, 64):
        assert sorted(map(tuple, cap_per_source(
            d, 10, salt_buckets=sb).collect())) == base, sb
    # deterministic re-run
    again = sorted(map(tuple, cap_per_source(d, 10).collect()))
    assert again == base


def test_chunk_documents_overlap_layout(spark):
    from jena_spark.data.pack import chunk_documents

    docs = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "a b c d e f g h"), (3, "x"),
         (4, "  p  q  ")],
        "doc_id long, text string")
    out = {(r["doc_id"], r["chunk_idx"]):
           (r["start_tok"], r["n_chunk_tokens"], r["chunk_text"])
           for r in chunk_documents(docs, chunk_tokens=3,
                                    overlap=1).collect()}
    assert out[(1, 0)] == (0, 3, "a b c")
    assert out[(1, 1)] == (2, 3, "c d e")
    assert out[(1, 2)] == (4, 3, "e f g")
    # 8 tokens: the last window is short
    assert out[(2, 3)] == (6, 2, "g h")
    # single-token and whitespace-normalized docs chunk once
    assert out[(3, 0)] == (0, 1, "x")
    assert out[(4, 0)] == (0, 2, "p q")
    # consecutive chunks share exactly `overlap` tokens
    assert out[(1, 0)][2].split()[-1:] == out[(1, 1)][2].split()[:1]
    assert len([k for k in out if k[0] == 1]) == 3
    assert len([k for k in out if k[0] == 2]) == 4


def test_shuffle_shards_layout_and_determinism(spark):
    from jena_spark.data.selection import shuffle_shards

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(200)], "doc_id long, text string")
    out = shuffle_shards(docs, n_shards=4, salt="s").collect()
    assert len(out) == 200
    by_shard = {}
    for r in out:
        assert 0 <= r["shard"] < 4
        by_shard.setdefault(r["shard"], []).append(r)
    # positions are contiguous 1..n per shard and follow key order
    for rows in by_shard.values():
        rows.sort(key=lambda r: r["pos_in_shard"])
        assert [r["pos_in_shard"] for r in rows] == \
            list(range(1, len(rows) + 1))
        keys = [(r["shuffle_key"], r["doc_id"]) for r in rows]
        assert keys == sorted(keys)
    # deterministic across partitionings; a different salt reshuffles
    again = shuffle_shards(docs.repartition(13), n_shards=4,
                           salt="s").collect()
    key = lambda rs: sorted((r["doc_id"], r["shard"], r["pos_in_shard"])
                            for r in rs)
    assert key(again) == key(out)
    other = shuffle_shards(docs, n_shards=4, salt="t").collect()
    assert key(other) != key(out)


def test_epoch_upsample_counts(spark):
    from jena_spark.data.selection import epoch_upsample

    docs = spark.createDataFrame(
        [(i, "a" if i < 100 else ("b" if i < 200 else "c"))
         for i in range(300)], "doc_id long, source string")
    out = epoch_upsample(docs, {"a": 2.5, "b": 1.0}).collect()
    per_doc = {}
    for r in out:
        per_doc.setdefault(r["doc_id"], []).append(r["epoch"])
    # source c (absent) dropped entirely
    assert all(d < 200 for d in per_doc)
    # b: exactly one copy, epoch 0
    assert all(per_doc[d] == [0] for d in range(100, 200))
    # a: 2 or 3 copies, contiguous epochs from 0; fraction ~ half
    n3 = 0
    for d in range(100):
        es = sorted(per_doc[d])
        assert es in ([0, 1], [0, 1, 2])
        n3 += len(es) == 3
    assert 25 <= n3 <= 75
    # deterministic
    again = epoch_upsample(docs.repartition(7), {"a": 2.5, "b": 1.0})
    assert sorted(map(tuple, again.collect())) == sorted(map(tuple, out))


def test_importance_resample_bias_and_determinism(spark):
    from jena_spark.data.selection import importance_resample

    # 100 low-score docs (0 unats) + 100 high-score docs (+3 nats)
    scores = spark.createDataFrame(
        [(i, 0 if i < 100 else 30000) for i in range(200)],
        "doc_id long, score_unats long")
    out = importance_resample(scores, n=50, salt="s").collect()
    assert len(out) == 50
    assert sorted(r["rank"] for r in out) == list(range(1, 51))
    # ranks follow descending key
    byrank = sorted(out, key=lambda r: r["rank"])
    keys = [r["key_r"] for r in byrank]
    assert keys == sorted(keys, reverse=True)
    # exp(3) ~ 20x preference: the sample must be dominated by the
    # high-score half (P[this failing under the null] is negligible)
    n_high = sum(r["doc_id"] >= 100 for r in out)
    assert n_high >= 40
    # deterministic; a different salt redraws
    again = importance_resample(scores.repartition(9), n=50, salt="s")
    assert sorted(map(tuple, again.collect())) == sorted(map(tuple, out))
    other = {r["doc_id"] for r in
             importance_resample(scores, n=50, salt="t").collect()}
    assert other != {r["doc_id"] for r in out}


def test_chunk_documents_reconstruction_property(spark):
    """Stitching chunks (dropping each subsequent chunk's first
    `overlap` tokens) reproduces the original token stream — for
    assorted lengths around every boundary condition."""
    from jena_spark.data.pack import chunk_documents

    texts = [(n, " ".join(f"w{i}" for i in range(1, n + 1)))
             for n in (1, 2, 5, 6, 7, 8, 12, 13, 19, 40)]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    W, O = 6, 2
    rows = chunk_documents(docs, chunk_tokens=W, overlap=O).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for n, text in texts:
        chunks = sorted(by_doc[n], key=lambda r: r["chunk_idx"])
        toks = []
        for j, r in enumerate(chunks):
            ct = r["chunk_text"].split(" ")
            assert len(ct) == r["n_chunk_tokens"] <= W
            toks.extend(ct if j == 0 else ct[O:])
        assert toks == text.split(" "), (n, toks)
        # every chunk except possibly the last is full-width
        assert all(r["n_chunk_tokens"] == W for r in chunks[:-1])


def test_data_op_input_guards(spark):
    import pytest

    from jena_spark.data.pack import chunk_documents
    from jena_spark.data.selection import importance_resample
    from jena_spark.data.similarity import kmeans

    d = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(d, chunk_tokens=4, overlap=-1)
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(d, chunk_tokens=4, overlap=4)
    s = spark.createDataFrame([(1, 10)], "doc_id long, score_unats long")
    with pytest.raises(ValueError, match="temperature"):
        importance_resample(s, 1, temperature=0)
    e = spark.createDataFrame([(0, [1.0, 0.0])],
                              "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="kmeans: k="):
        kmeans(e, k=3)


def test_domain_mixture_upweights_hard_domains(spark):
    # "easy" = one repetitive sentence everywhere; "hard" = per-doc
    # distinct vocabulary the shared bigram LM models poorly.
    rows = [(i, "easy", "the cat sat on the mat the cat sat") for i in range(20)]
    rows += [(i + 100, "hard",
              f"zeta{i} quark{i*7} blorp{i*13} vex{i*3} nub{i*11} vex{i} vog{i*5}")
             for i in range(20)]
    d = spark.createDataFrame(rows, "doc_id long, source string, text string")
    from jena_spark.data.selection import domain_mixture

    out = {r.source: r.asDict() for r in domain_mixture(d).collect()}
    assert set(out) == {"easy", "hard"}
    # weights normalize (1e-6 rounding per domain)
    assert abs(out["easy"]["weight_r"] + out["hard"]["weight_r"] - 1.0) < 1e-5
    # the hard domain's excess is positive and its weight exceeds its
    # token share; the easy domain sits at or below token share
    tn = out["easy"]["n_bigrams"] + out["hard"]["n_bigrams"]
    assert out["hard"]["excess_ubits"] > 0
    assert out["hard"]["weight_r"] > out["hard"]["n_bigrams"] / tn
    assert out["easy"]["excess_ubits"] == 0
    # deterministic
    again = {r.source: r.weight_r for r in domain_mixture(d).collect()}
    assert again == {s: v["weight_r"] for s, v in out.items()}
    # explicit priors: unlisted domains drop; listed renormalize to 1
    pri = {r.source: r.weight_r
           for r in domain_mixture(d, ref_weights={"easy": 3.0}).collect()}
    assert set(pri) == {"easy"} and abs(pri["easy"] - 1.0) < 1e-5
    # eta=0 reduces to the prior (token share) exactly
    flat = {r.source: r.weight_r for r in domain_mixture(d, eta=0.0).collect()}
    for s in flat:
        assert abs(flat[s] - out[s]["n_bigrams"] / tn) < 2e-6


def test_unimax_mixture(spark):
    """Water-filling allocation: smallest language capped at
    max_epochs, remainder split equally; budget edge cases."""
    from jena_spark.data.selection import unimax_mixture

    rows = [("A", ("t " * 10).strip()), ("B", ("t " * 100).strip()),
            ("C", ("t " * 1000).strip())]
    df = spark.createDataFrame(rows, "lang string, text string")
    out = {r.lang: r
           for r in unimax_mixture(df, budget=500, max_epochs=3).collect()}
    # caps 30/300/3000: A fits 3 full epochs (30*3 + 0 <= 500 is the
    # prefix test with L=3 -> 90 <= 500), B/C split (500-30)//2 = 235
    assert (out["A"].alloc_tokens, out["B"].alloc_tokens,
            out["C"].alloc_tokens) == (30, 235, 235)
    assert out["A"].epochs_micro == 3_000_000
    assert out["B"].epochs_micro == 2_350_000
    assert out["C"].epochs_micro == 235_000
    # budget above total capped supply: every language at its cap,
    # remainder deliberately unspent
    full = {r.lang: r
            for r in unimax_mixture(df, budget=10**9,
                                    max_epochs=2).collect()}
    assert all(full[l].alloc_tokens == full[l].cap_tokens for l in "ABC")
    # zero budget: nothing allocates
    zero = {r.lang: r
            for r in unimax_mixture(df, budget=0, max_epochs=2).collect()}
    assert all(zero[l].alloc_tokens == 0 for l in "ABC")
    # guards
    import pytest as _pytest
    with _pytest.raises(ValueError):
        unimax_mixture(df, budget=-1)
    with _pytest.raises(ValueError):
        unimax_mixture(df, budget=1, max_epochs=0)
