"""Benchmark n-gram decontamination (``data/decontaminate.py``)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from jena_spark.data.decontaminate import decontaminate, ngrams  # noqa: E402

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog tonight"),
    (1, "a completely different sentence with no shared phrasing at all"),
    (2, "prefix words then the quick brown fox jumps over the lazy dog"),
    (3, "too short"),
    # punctuation/case must normalize away before gram comparison
    (4, "The QUICK, brown fox! Jumps over the lazy dog? tonight"),
]


def _frames(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    bench = spark.createDataFrame(
        [("the quick brown fox jumps over the lazy dog",)], "text string")
    return docs, bench


def test_flags_and_counts(spark):
    docs, bench = _frames(spark)
    out = {r.doc_id: r for r in decontaminate(docs, bench, n=8).collect()}
    assert len(out) == 5  # every input doc gets a row
    # docs 0, 2, 4 contain the benchmark 8-grams; 1 and 3 do not
    assert {i for i, r in out.items() if r.contaminated} == {0, 2, 4}
    # the 9-word benchmark has two 8-grams; doc 0 contains both
    assert out[0].n_contaminated_grams == 2
    assert out[1].n_contaminated_grams == 0
    assert out[3].n_contaminated_grams == 0


def test_hash_grams_identical(spark):
    """The scale path (8-byte hashed broadcast) must flag identically."""
    docs, bench = _frames(spark)
    plain = decontaminate(docs, bench, n=8).collect()
    hashed = decontaminate(docs, bench, n=8, hash_grams=True).collect()
    assert sorted(map(tuple, plain)) == sorted(map(tuple, hashed))


def test_ngrams_distinct_per_doc(spark):
    df = spark.createDataFrame([(7, "a b a b a b")], "doc_id long, text string")
    rows = ngrams(df, "doc_id", "text", 2).collect()
    # six positions but only two distinct bigrams
    assert sorted(r.gram for r in rows) == ["a b", "b a"]


def test_corpus_side_never_shuffles(spark):
    """Scale invariant: the corpus side of the gram join is map-only
    (Scan -> explode -> BroadcastHashJoin). Every non-broadcast
    Exchange in the plan carries either benchmark grams or join HITS —
    never raw corpus grams. Three such exchanges exist (bench-gram
    distinct, hit distinct, per-doc count); a pre-join corpus distinct
    would add a fourth."""
    docs, bench = _frames(spark)
    plan = decontaminate(docs, bench, n=8)._jdf.queryExecution() \
        .executedPlan().toString()
    # the gram join is a broadcast hash join ...
    lines = plan.splitlines()
    (j,) = [i for i, l in enumerate(lines)
            if "BroadcastHashJoin [gram" in l]
    # ... whose corpus branch (the lines between the join and its
    # broadcast build side) is Generate/Project/Filter/Scan only — no
    # Exchange of raw corpus grams
    branch = []
    for line in lines[j + 1:]:
        if "BroadcastExchange" in line:
            break
        branch.append(line)
    assert any("Generate" in l for l in branch)
    assert not any("Exchange" in l for l in branch), branch


def test_short_docs_and_empty_benchmark(spark):
    docs = spark.createDataFrame(
        [(0, "one two three")], "doc_id long, text string")
    empty_bench = spark.createDataFrame([], "text string")
    out = decontaminate(docs, empty_bench, n=8).collect()
    assert len(out) == 1 and not out[0].contaminated


def test_semantic_decontaminate_flags_near_paraphrases(spark):
    from jena_spark.data.decontaminate import decontaminate_semantic

    bench = spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0]), (101, [0.0, 1.0, 0.0])],
        "vec_id long, embedding array<float>")
    corpus = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0]),    # identical to bench 100 -> cos 1
         (1, [0.9, 0.1, 0.0]),    # near bench 100
         (2, [0.0, 0.0, 1.0]),    # orthogonal to both
         (3, [0.0, -1.0, 0.0])],  # anti-parallel to bench 101
        "vec_id long, embedding array<float>")
    out = {r.vec_id: r for r in decontaminate_semantic(
        corpus, bench, threshold=0.95).collect()}
    assert out[0].contaminated == 1 and out[0].max_cos_r == 1.0
    assert out[1].contaminated == 1 and out[1].max_cos_r > 0.99
    assert out[2].contaminated == 0 and out[2].max_cos_r == 0.0
    assert out[3].contaminated == 0 and out[3].max_cos_r == 0.0


def test_semantic_decontaminate_benchmark_is_broadcast(spark):
    from jena_spark.data.decontaminate import decontaminate_semantic

    bench = spark.createDataFrame(
        [(100, [1.0, 0.0])], "vec_id long, embedding array<float>")
    corpus = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(8)],
        "vec_id long, embedding array<float>")
    plan = decontaminate_semantic(corpus, bench)._jdf.queryExecution() \
        .executedPlan().toString()
    # the expand is a broadcast nested loop; the only Exchange is the
    # per-id max aggregation
    assert "BroadcastNestedLoopJoin" in plan
    assert plan.count("Exchange hashpartitioning") <= 1


def test_fractional_decontamination(spark):
    from jena_spark.data.decontaminate import decontaminate_fraction

    docs = spark.createDataFrame(
        [
            # 10 words -> 8 distinct 3-grams; bench covers the first 5
            # words -> 3 hits -> 3750 bp: flagged at 3000, not at 4000
            (1, "a b c d e f g h i j"),
            # full copy of a benchmark instance -> 10000 bp
            (2, "a b c d e"),
            # no overlap at all
            (3, "p q r s t u v w"),
            # shorter than n -> total 0, never contaminated
            (4, "x y"),
            # repeated words: distinct-gram denominator ("a b a b a b"
            # -> grams {a b a, b a b} -> total 2), zero hits
            (5, "a b a b a b"),
        ],
        "doc_id long, text string")
    bench = spark.createDataFrame([("a b c d e",)], "text string")

    out = {r.doc_id: r for r in
           decontaminate_fraction(docs, bench, n=3,
                                  threshold_bp=3000).collect()}
    assert out[1].total_grams == 8 and out[1].n_contaminated_grams == 3
    assert out[1].frac_bp == 3750 and out[1].contaminated
    assert out[2].frac_bp == 10000 and out[2].contaminated
    assert out[3].n_contaminated_grams == 0 and not out[3].contaminated
    assert out[4].total_grams == 0 and out[4].frac_bp == 0
    assert not out[4].contaminated
    assert out[5].total_grams == 2 and not out[5].contaminated

    hi = {r.doc_id: r.contaminated for r in
          decontaminate_fraction(docs, bench, n=3,
                                 threshold_bp=4000).collect()}
    assert not hi[1] and hi[2]  # exact boundary arithmetic, no floats


def test_conversation_decontamination(spark):
    from jena_spark.data.decontaminate import decontaminate_conversations

    turns = spark.createDataFrame(
        [
            # c1: assistant echoes a benchmark answer -> contaminated
            ("c1", 0, "user", "what is the capital of france"),
            ("c1", 1, "assistant", "the capital of france is paris"),
            # c2: the USER quotes the benchmark, assistant clean ->
            # default roles=('assistant',) must NOT flag it
            ("c2", 0, "user", "the capital of france is paris right"),
            ("c2", 1, "assistant", "yes that city is correct indeed"),
            # c3: entirely unrelated
            ("c3", 0, "user", "how do i sort a list in python"),
            ("c3", 1, "assistant", "use the sorted builtin function here"),
            # c4: assistant-only conv, two echoed turns -> grams count
            # once across the conversation (distinct per conv)
            ("c4", 0, "assistant", "the capital of france is paris"),
            ("c4", 1, "assistant", "The Capital of France is PARIS!"),
        ],
        "conv_id string, turn_idx int, role string, text string")
    bench = spark.createDataFrame(
        [("the capital of france is paris",)], "text string")

    out = {r.conv_id: r for r in
           decontaminate_conversations(turns, bench, n=5).collect()}
    assert set(out) == {"c1", "c2", "c3", "c4"}
    assert out["c1"].contaminated and out["c1"].n_contaminated_grams == 2
    assert not out["c2"].contaminated
    assert not out["c3"].contaminated
    # normalization collapses case/punct; distinct-per-conv counting
    assert out["c4"].n_contaminated_grams == 2
    # widening roles flags the user-quoting conversation too
    wide = {r.conv_id: r.contaminated for r in decontaminate_conversations(
        turns, bench, n=5, roles=("assistant", "user")).collect()}
    assert wide["c2"] and wide["c1"] and not wide["c3"]
