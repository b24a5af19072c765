"""Hard-negative mining (jena_spark.data.retrieval)."""

import pytest

from jena_spark.data.retrieval import hard_negatives


def _frames(spark):
    queries = spark.createDataFrame(
        [
            ("q1", "apple banana cherry", "g1"),
            ("q2", "xylophone zebra", "g2"),
        ],
        "qid string, text string, grp string")
    corpus = spark.createDataFrame(
        [
            # d1 shares 3 tokens with q1 but is in q1's OWN group ->
            # excluded (it's the positive)
            ("d1", "apple banana cherry pie", "g1"),
            # d2/d3 share 2 tokens; d3 additionally differs in id only
            # at equal overlap -> rank tie broken by did asc
            ("d2", "apple banana bread", "g9"),
            ("d3", "banana cherry smoothie", "g9"),
            # d4 shares 1 token -> below min_overlap=2
            ("d4", "apple pie", "g9"),
            # d5 exactly repeats q1 -> overlap 3, rank 1
            ("d5", "cherry banana apple", "g8"),
            # nothing shares >=2 tokens with q2
            ("d6", "zebra crossing", "g9"),
        ],
        "did string, text string, grp string")
    return queries, corpus


def test_hard_negatives_ranking_and_exclusion(spark):
    queries, corpus = _frames(spark)
    out = hard_negatives(queries, corpus, k=5, min_overlap=2,
                         qgroup="grp", dgroup="grp").collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.qid, []).append(r)
    # q1: d5 (overlap 3) then d2/d3 (overlap 2, did tie-break); d1
    # excluded by group, d4 below min_overlap
    got = [(r.did, r.overlap, r.rank)
           for r in sorted(by_q["q1"], key=lambda r: r.rank)]
    assert got == [("d5", 3, 1), ("d2", 2, 2), ("d3", 2, 3)]
    # q2: zebra alone is 1 shared token -> no rows
    assert "q2" not in by_q


def test_hard_negatives_k_cap_and_ungrouped(spark):
    queries, corpus = _frames(spark)
    out = hard_negatives(queries, corpus, k=1, min_overlap=2).collect()
    ranked = {r.qid: (r.did, r.overlap) for r in out}
    # ungrouped: the same-group d1 is now the best candidate (3 shared
    # tokens, did 'd1' < 'd5' at the tie)
    assert ranked["q1"] == ("d1", 3)
    assert len(out) == 1


def test_hard_negatives_max_df_drops_hot_tokens(spark):
    queries = spark.createDataFrame(
        [("q1", "common apple", "g1")], "qid string, text string, grp string")
    corpus = spark.createDataFrame(
        [("d%d" % i, "common filler", "g9") for i in range(5)]
        + [("dx", "apple common", "g9")],
        "did string, text string, grp string")
    # 'common' has df 6 > 3 -> dropped on BOTH sides; only 'apple'
    # scores, and min_overlap=1 keeps dx alone
    out = hard_negatives(queries, corpus, k=10, min_overlap=1, max_df=3,
                         qgroup="grp", dgroup="grp").collect()
    assert [(r.did, r.overlap) for r in out] == [("dx", 1)]


def test_hard_negatives_input_guards(spark):
    queries, corpus = _frames(spark)
    with pytest.raises(ValueError):
        hard_negatives(queries, corpus, qgroup="grp")  # dgroup missing
    with pytest.raises(ValueError):
        hard_negatives(queries, corpus, k=0)
    with pytest.raises(ValueError):
        hard_negatives(queries, corpus, min_overlap=0)


def test_hard_negatives_no_cartesian_plan(spark):
    queries, corpus = _frames(spark)
    plan = (hard_negatives(queries, corpus, k=3, min_overlap=2,
                           qgroup="grp", dgroup="grp")
            ._jdf.queryExecution().executedPlan().toString())
    # token-equality join only - never a nested-loop over all pairs
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_retrieval_eval(spark):
    import duckdb

    from jena_spark.data.retrieval import retrieval_eval, retrieval_eval_sql

    corpus = [(1, "alpha beta gamma delta"),
              (2, "alpha beta gamma zeta"),
              (3, "unrelated words entirely different")]
    queries = [(10, "alpha beta gamma"),     # ties docs 1,2 -> doc 1 first
               (11, "unrelated words"),      # doc 3
               (12, "nothing matches here")]
    gold = [(10, 2), (11, 3), (12, 1)]
    c = spark.createDataFrame(corpus, "did bigint, text string")
    q = spark.createDataFrame(queries, "qid bigint, text string")
    g = spark.createDataFrame(gold, "qid bigint, gold_did bigint")
    out = {r["qid"]: r for r in
           retrieval_eval(q, c, g, k=2).collect()}
    # q10: docs 1 and 2 both overlap 3; tie-break did asc -> gold(2)
    # at rank 2 -> rr 500
    assert (out[10]["rank"], out[10]["hit"], out[10]["rr_pm"]) == (2, 1, 500)
    assert (out[11]["rank"], out[11]["rr_pm"]) == (1, 1000)
    # q12 matches nothing: miss row with rank 0
    assert (out[12]["rank"], out[12]["hit"], out[12]["rr_pm"]) == (0, 0, 0)

    got = sorted(map(tuple, retrieval_eval(q, c, g, k=2).collect()))
    qc = "SELECT * FROM (VALUES " + ", ".join(
        f"({i}, '{t}')" for i, t in queries) + ") AS v(qid, text)"
    cc = "SELECT * FROM (VALUES " + ", ".join(
        f"({i}, '{t}')" for i, t in corpus) + ") AS v(did, text)"
    gc = "SELECT * FROM (VALUES " + ", ".join(
        f"({a}, {b})" for a, b in gold) + ") AS v(qid, gold_did)"
    want = sorted(map(tuple, duckdb.sql(
        retrieval_eval_sql(qc, cc, gc, k=2)).fetchall()))
    assert got == want
