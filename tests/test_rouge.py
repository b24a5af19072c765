"""ROUGE-L near-dedup (jena_spark.data.rouge)."""

import random

import pytest

from jena_spark.data.rouge import lcs_len, rougel_dedup, rougel_pairs


def _lcs_naive(a, b):
    prev = [0] * (len(b) + 1)
    for x in a:
        cur = [0]
        for j, y in enumerate(b, 1):
            cur.append(max(prev[j], cur[j - 1],
                           prev[j - 1] + (1 if x == y else 0)))
        prev = cur
    return prev[-1]


def test_lcs_len_matches_naive_dp():
    rng = random.Random(42)
    vocab = list("abcde")
    for _ in range(200):
        a = [rng.choice(vocab) for _ in range(rng.randint(0, 12))]
        b = [rng.choice(vocab) for _ in range(rng.randint(0, 12))]
        assert lcs_len(a, b) == _lcs_naive(a, b), (a, b)
    assert lcs_len([], ["x"]) == 0
    assert lcs_len(list("abcbdab"), list("bdcaba")) == 4  # classic case


def test_rougel_pairs_known_values(spark):
    docs = spark.createDataFrame(
        [
            (1, "write a poem about spring flowers"),
            # re-ordering: Jaccard-1 but LCS-limited
            (2, "spring flowers write a poem about"),
            (3, "write a poem about autumn leaves"),
            (4, "unrelated database tuning advice"),
        ],
        "doc_id long, text string")
    got = {(r.doc_a, r.doc_b): r
           for r in rougel_pairs(docs, min_overlap=2).collect()}
    # (1,2): LCS of the rotation = 4 ("write a poem about"),
    # rouge = 2000*4 // 12 = 666
    assert got[(1, 2)].lcs == 4 and got[(1, 2)].rouge_pm == 666
    # (1,3): share the 4-token prefix, rouge = 666 as well
    assert got[(1, 3)].lcs == 4 and got[(1, 3)].rouge_pm == 666
    # doc 4 shares no token with anything
    assert not any(4 in k for k in got)


def test_rougel_dedup_election_and_guards(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),  # near-dup
            (3, "completely different content entirely here now"),
        ],
        "doc_id long, text string")
    out = {r.doc_id: r for r in rougel_dedup(docs,
                                             threshold_pm=700).collect()}
    # rouge(1,2) = 2000*8 // 18 = 888 >= 700 -> 2 doomed by 1
    assert out[1].keep == 1
    assert out[2].keep == 0 and out[2].n_smaller_dups == 1
    assert out[3].keep == 1
    with pytest.raises(ValueError):
        rougel_dedup(docs, threshold_pm=0)
    with pytest.raises(ValueError):
        rougel_dedup(docs, min_overlap=0)
    with pytest.raises(ValueError):
        rougel_dedup(docs, max_tokens=0)


def test_rougel_candidate_recall_vs_exhaustive(spark):
    """On a corpus where every similar pair shares >= min_overlap
    distinct tokens, blocked scoring equals exhaustive scoring."""
    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(30)]
    texts = {}
    for i in range(40):
        base = [rng.choice(vocab) for _ in range(12)]
        texts[2 * i] = " ".join(base)
        mut = list(base)
        mut[rng.randrange(12)] = rng.choice(vocab)
        texts[2 * i + 1] = " ".join(mut)
    docs = spark.createDataFrame(sorted(texts.items()),
                                 "doc_id long, text string")
    got = {(r.doc_a, r.doc_b): r.rouge_pm
           for r in rougel_pairs(docs, min_overlap=1,
                                 min_rouge_pm=700).collect()}
    toks = {i: t.split() for i, t in texts.items()}
    ids = sorted(texts)
    for i_a in ids:
        for i_b in ids:
            if i_a >= i_b:
                continue
            pm = (2000 * _lcs_naive(toks[i_a], toks[i_b])) \
                // (len(toks[i_a]) + len(toks[i_b]))
            if pm >= 700:
                assert got.get((i_a, i_b)) == pm, (i_a, i_b, pm)
    assert all(v >= 700 for v in got.values())


def test_rougel_max_tokens_truncation(spark):
    docs = spark.createDataFrame(
        [(1, "a b c " + "x " * 50), (2, "a b c " + "y " * 50)],
        "doc_id long, text string")
    out = {(r.doc_a, r.doc_b): r
           for r in rougel_pairs(docs, max_tokens=3).collect()}
    r = out[(1, 2)]
    # both truncate to [a, b, c]: lcs 3 of 6 -> rouge 1000
    assert r.lcs == 3 and r.rouge_pm == 1000
