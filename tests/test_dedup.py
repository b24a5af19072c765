"""Dedup operator tests on planted near/exact duplicates."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from jena_spark.data import dedup as D

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy dog"),          # exact dup of 0
    (2, "the quick brown fox jumps over the lazy cat"),          # near dup of 0
    (3, "completely different content about spark shuffles"),
    (4, "spark shuffles completely different content about"),  # same token set as 3
    (5, "unrelated tiny doc"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_exact_dedup(spark, docs):
    groups = D.exact_groups(docs)
    dup = groups.where(F.col("n_docs") > 1).collect()
    assert len(dup) == 1 and dup[0]["rep_id"] == 0 and dup[0]["n_docs"] == 2
    kept = D.drop_exact_dups(docs)
    assert kept.count() == 5
    assert kept.where(F.col("doc_id") == 1).count() == 0


def test_jaccard_pairs(spark, docs):
    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in
             D.jaccard_pairs(docs, threshold=0.5).collect()}
    assert pairs[(0, 1)] == 1.0          # exact dup
    assert pairs[(3, 4)] == 1.0          # same token set, different order
    assert 0.5 <= pairs[(0, 2)] < 1.0    # near dup
    assert (0, 5) not in pairs and (3, 5) not in pairs


def test_jaccard_ngram_stricter(spark, docs):
    # 3-gram shingles: word order matters — (3,4) no longer identical
    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in
             D.jaccard_pairs(docs, threshold=0.9, ngram=3).collect()}
    assert (0, 1) in pairs
    assert (3, 4) not in pairs


def test_minhash_lsh_recall_and_verify(spark, docs):
    got = {(r["doc_a"], r["doc_b"]) for r in
           D.minhash_dedup_pairs(docs, threshold=0.5, k=32, bands=16).collect()}
    true = {(r["doc_a"], r["doc_b"]) for r in
            D.jaccard_pairs(docs, threshold=0.5).collect()}
    # verified candidates are a subset of true pairs (precision 1 by
    # construction); with 16 bands of 2 rows recall on >=0.8-sim pairs
    # should be total on this tiny set
    assert got <= true
    assert (0, 1) in got and (3, 4) in got


def test_simhash_near_pairs(spark, docs):
    sh = {r["doc"]: r["simhash"] for r in D.simhash(docs).collect()}
    assert sh[0] == sh[1]  # identical text -> identical fingerprint
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in
             D.simhash_near_pairs(docs, max_hamming=16).collect()}
    assert pairs[(0, 1)] == 0
    assert pairs[(3, 4)] == 0  # token-set equal -> same fingerprint
    assert (0, 2) in pairs     # near dup within hamming 16


def test_embedding_near_dups(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.999, 0.01, 0.0, 0.0]),   # near dup of 0
        (2, [0.0, 1.0, 0.0, 0.0]),      # orthogonal
        (3, [-1.0, 0.0, 0.0, 0.0]),     # opposite
    ]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = {(r["id_a"], r["id_b"]) for r in
             D.embedding_near_dups(e, threshold=0.95).collect()}
    assert pairs == {(0, 1)}


def test_simhash_blocking_pigeonhole(spark):
    """Property: every pair within max_hamming (by brute force over all
    fingerprints) is found by the blocked join — the pigeonhole
    guarantee that n_blocks = max_hamming + 1 restores (4 blocks only
    covered distance 3)."""
    rows = [(i, f"w{i % 7} common tokens here plus x{i} y{i * 3 % 11} z{i * 5 % 13}")
            for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    for max_h in (4, 8):
        sh = {r["doc"]: r["simhash"] for r in D.simhash(docs).collect()}
        brute = {
            (a, b)
            for a in sh for b in sh
            if a < b and bin((sh[a] ^ sh[b]) & ((1 << 64) - 1)).count("1") <= max_h
        }
        blocked = {(r["doc_a"], r["doc_b"]) for r in
                   D.simhash_near_pairs(docs, max_hamming=max_h).collect()}
        assert brute <= blocked, f"missed pairs at max_hamming={max_h}: {brute - blocked}"
        # and nothing beyond the distance bound is returned
        assert blocked <= brute


def test_minhash_verify_values_match_exact(spark, docs):
    """The candidates-only verify (jaccard_for_pairs) must score
    exactly like the exhaustive inverted-index path."""
    got = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in
           D.minhash_dedup_pairs(docs, threshold=0.5, k=32, bands=16).collect()}
    true = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in
            D.jaccard_pairs(docs, threshold=0.5).collect()}
    for pair, j in got.items():
        assert true[pair] == j


def test_jaccard_for_pairs_zero_overlap(spark, docs):
    pairs = spark.createDataFrame([(0, 5), (0, 1)], "doc_a long, doc_b long")
    out = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in
           D.jaccard_for_pairs(pairs, docs).collect()}
    assert out[(0, 5)] == 0.0
    assert out[(0, 1)] == 1.0


def test_hot_tokens_visibility(spark, docs):
    """max_df capping is visible, not silent: hot_tokens reports what a
    cap drops, and capped jaccard equals jaccard over the reduced token
    sets."""
    hot = {r["tok"]: r["df"] for r in D.hot_tokens(docs, max_df=2).collect()}
    assert "the" in hot and hot["the"] >= 3
    capped = {(r["doc_a"], r["doc_b"]) for r in
              D.jaccard_pairs(docs, threshold=0.5, max_df=2).collect()}
    # docs 0/1 still identical after dropping shared hot tokens
    assert (0, 1) in capped


def test_jaccard_for_pairs_tokenless_docs(spark):
    """r2 advice: a supplied pair referencing an empty/whitespace doc
    must score jaccard 0, not vanish from the output."""
    from jena_spark.data.dedup import jaccard_for_pairs

    docs = spark.createDataFrame(
        [("d1", "hello world"), ("d2", "   "), ("d3", "")],
        "doc_id string, text string",
    )
    pairs = spark.createDataFrame(
        [("d1", "d2"), ("d2", "d3"), ("d1", "d3")], "doc_a string, doc_b string"
    )
    out = {(r["doc_a"], r["doc_b"]): r["jaccard"]
           for r in jaccard_for_pairs(pairs, docs).collect()}
    assert out == {("d1", "d2"): 0.0, ("d2", "d3"): 0.0, ("d1", "d3"): 0.0}


def test_dedup_clusters_transitive_chain(spark):
    """a-b, b-c, d-e pairs: {a,b,c} and {d,e} clusters, min id
    survives; singleton f kept when docs frame is supplied."""
    from pyspark.sql import functions as F

    from jena_spark.data.dedup import dedup_clusters

    pairs = spark.createDataFrame(
        [(12, 3), (3, 47), (100, 90)], "doc_a long, doc_b long")
    docs = spark.createDataFrame(
        [(3,), (12,), (47,), (90,), (100,), (7,)], "doc_id long")
    out = {(r["doc_id"], r["cluster"], r["keep"])
           for r in dedup_clusters(pairs, docs=docs).collect()}
    assert out == {
        (3, 3, True), (12, 3, False), (47, 3, False),
        (90, 90, True), (100, 90, False),
        (7, 7, True),
    }
    # without docs: only paired ids appear
    only = dedup_clusters(pairs)
    assert only.count() == 5
    # survivors per cluster == 1
    k = only.where(F.col("keep")).count()
    assert k == 2


def test_exact_dedup_incremental_equals_oneshot(spark):
    """Invariant: folding batches in id order == one-shot exact_groups
    over the concatenation (state and survivors both)."""
    from jena_spark.data.dedup import exact_dedup_incremental, exact_groups

    texts = ["aaa", "bbb", "ccc", "ddd"]
    rows = [(i, texts[i % 4] if i < 8 else f"unique {i}")
            for i in range(12)]
    all_docs = spark.createDataFrame(rows, "doc_id long, text string")
    batches = [all_docs.where(c) for c in
               ("doc_id < 5", "doc_id >= 5 and doc_id < 9", "doc_id >= 9")]
    state = None
    verdicts = []
    for b in batches:
        v, state = exact_dedup_incremental(b, state)
        verdicts.append(v.collect())
    oneshot = {(r.text_hash, r.rep_id) for r in
               exact_groups(all_docs).select("text_hash", "rep_id").collect()}
    assert {(r.text_hash, r.rep_id) for r in state.collect()} == oneshot
    flat = [r for v in verdicts for r in v]
    assert len(flat) == 12
    assert {r.doc_id for r in flat if r.kept} == {r[1] for r in oneshot}
    # each verdict's rep_id is the global first occurrence of its text
    by_text = {}
    for i, t in rows:
        by_text.setdefault(t, i)
    for r in flat:
        assert r.rep_id == by_text[rows[r.doc_id][1]]


def test_curate_corpus_reasons_and_apply(spark):
    """Verdicts: reason precedence (lang > quality > exact_dup >
    near_dup), apply_curation keeps exactly the kept slice."""
    from jena_spark.data.curate import apply_curation, curate_corpus

    good = ("the cat and the dog is of a big house to a point that it "
            "goes for a walk in the park and that is good ") * 4
    docs = spark.createDataFrame(
        [
            (1, good, "en", "s", len(good)),          # kept
            (2, good, "fr", "s", len(good)),          # lang (also exact dup)
            (3, "x", "en", "s", 1),                   # quality
            (4, good, "en", "s", len(good)),          # exact_dup of 1
            (5, good + "slightly different tail here the end", "en", "s", 1),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    v = curate_corpus(docs, langs=("en",), min_quality_bp=5000)
    got = {(r["doc_id"], r["kept"], r["reason"]) for r in v.collect()}
    assert (1, True, None) in got
    assert (2, False, "lang") in got          # lang outranks exact_dup
    assert (3, False, "quality") in got
    assert (4, False, "exact_dup") in got
    # doc 5 is a near-dup of the cluster around doc 1 (3-gram overlap)
    assert (5, False, "near_dup") in got
    kept = apply_curation(docs, v)
    assert {r["doc_id"] for r in kept.collect()} == {1}


def test_dedup_clusters_rejects_negative_ids(spark):
    from jena_spark.data.dedup import dedup_clusters

    pairs = spark.createDataFrame([(-9, -10)], "doc_a long, doc_b long")
    import pytest as _pt

    with _pt.raises(ValueError, match="negative doc ids"):
        dedup_clusters(pairs)


def test_curate_repetition_and_pii_rules(spark):
    """Opt-in curation rules: repetition fraction threshold and PII
    budget; default-off keeps the four-rule verdict unchanged."""
    from jena_spark.data.curate import curate_corpus

    rows = [
        (1, "a decent document with the usual words and the normal text for it", "en"),
        (2, "buy now buy now buy now buy now buy now buy now buy now it is", "en"),
        (3, "mail me at someone@example.com for the offer that is in the text", "en"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    strict = {r["doc_id"]: r for r in curate_corpus(
        docs, min_quality_bp=0, max_rep_frac=0.3, max_pii=0).collect()}
    assert strict[1]["kept"] and strict[1]["reason"] is None
    assert not strict[2]["kept"] and strict[2]["reason"] == "repetition"
    assert not strict[3]["kept"] and strict[3]["reason"] == "pii"
    # default-off: all three pass (distinct texts, en, quality waived)
    loose = {r["doc_id"]: r for r in curate_corpus(
        docs, min_quality_bp=0).collect()}
    assert all(loose[i]["kept"] for i in (1, 2, 3))


def test_curate_classifier_and_perplexity_rules(spark):
    """Opt-in NB-classifier gate and CCNet perplexity gate, with
    reason precedence classifier > perplexity > dedup."""
    from jena_spark.data.classifier import nb_train
    from jena_spark.data.curate import curate_corpus

    rows = [
        (1, "clean prose with meaning and structure and clarity", "en"),
        (2, "spam spam buy now click here buy spam now click", "en"),
        (3, "zq xv qj wk vz jx kq zw xq vj", "en"),  # unmodelable junk
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    labeled = spark.createDataFrame(
        [(10, "clean prose with meaning and clarity in structure", 1),
         (11, "spam buy now click here spam buy click now offer", 0)],
        "doc_id long, text string, label int")
    w = nb_train(labeled, buckets=128)
    # LM trained on prose-like reference: doc3's alien bigrams score
    # worst; classifier catches doc2 first (rule order)
    lm_ref = docs.where(F.col("doc_id") == 1).select("text")
    v = {r["doc_id"]: r for r in curate_corpus(
        docs, min_quality_bp=0, nb_weights=w, min_nb_unats=1,
        nb_buckets=128, max_avg_logprob=2.5, lm_docs=lm_ref).collect()}
    assert v[1]["kept"] and v[1]["reason"] is None
    assert not v[2]["kept"] and v[2]["reason"] == "classifier"
    assert not v[3]["kept"] and v[3]["reason"] in ("classifier", "perplexity")
    # with the classifier gate off, doc3 still fails on perplexity
    v2 = {r["doc_id"]: r for r in curate_corpus(
        docs, min_quality_bp=0, max_avg_logprob=2.5,
        lm_docs=lm_ref).collect()}
    assert not v2[3]["kept"] and v2[3]["reason"] == "perplexity"
    assert v2[1]["kept"]


def test_minhash_incremental_fold_equals_one_shot(spark):
    """Fold-chain == one fold of the concatenation under globally
    monotone ids — the same invariant exact_dedup_incremental pins."""
    from jena_spark.data.dedup import minhash_dedup_incremental

    base = "the quick brown fox jumps over the lazy dog near the bank"
    rows = []
    for i in range(30):
        if i % 3 == 0:
            txt = base
        elif i % 3 == 1:
            txt = base + f" extra{i}"          # near-dup of base
        else:
            txt = f"totally different text number {i} with unique words w{i} v{i} u{i}"
        rows.append((i, txt))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    b1 = docs.where("doc_id < 15")
    b2 = docs.where("doc_id >= 15")

    v1, st = minhash_dedup_incremental(b1, None, threshold=0.6)
    v2, st2 = minhash_dedup_incremental(b2, st, threshold=0.6)
    chained = sorted(map(tuple, v1.unionByName(v2).collect()))

    v_all, _ = minhash_dedup_incremental(docs, None, threshold=0.6)
    oneshot = sorted(map(tuple, v_all.collect()))
    assert chained == oneshot
    # state grew append-only to the full corpus
    assert st2.count() == 30
    # and the brute signature-estimate reference agrees
    from jena_spark.data.dedup import minhash_signatures
    import math

    sigs = {r["doc"]: list(r["sig"])
            for r in minhash_signatures(docs, 32).collect()}
    need = math.ceil(0.6 * 32)

    def est(a, b):
        return sum(x == y for x, y in zip(sigs[a], sigs[b]))

    for doc_id, kept, rep in chained:
        earlier_matches = [j for j in range(doc_id)
                           if est(j, doc_id) >= need]
        # LSH candidacy can only MISS pairs the estimate would accept
        # (banding recall), never invent them — kept docs must have no
        # candidate, and a reported rep must be a true estimate match
        if not kept:
            assert rep in earlier_matches
        else:
            assert rep == doc_id
    # the exact clones MUST collapse (identical sigs share every band)
    clones = {d: (k, r) for d, k, r in chained if d % 3 == 0}
    assert clones[0] == (True, 0)
    assert all(v == (False, 0) for d, v in clones.items() if d > 0)


def test_minhash_incremental_tokenless_docs_kept(spark):
    from jena_spark.data.dedup import minhash_dedup_incremental

    docs = spark.createDataFrame(
        [(0, "real text here"), (1, ""), (2, "   "), (3, "real text here")],
        "doc_id long, text string")
    v, st = minhash_dedup_incremental(docs, None)
    got = {r["doc_id"]: (r["kept"], r["rep_id"]) for r in v.collect()}
    assert got == {0: (True, 0), 1: (True, 1), 2: (True, 2),
                   3: (False, 0)}
    # token-less docs are not in the signature store
    assert st.count() == 2
