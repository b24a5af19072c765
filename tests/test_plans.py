"""Physical-plan audits — the Spark analog of the reference's optimizer
expectations (SURVEY.md §4): predicate pushdown reaches the parquet
scan (≙ TDB index-prefix choice), ORDER+LIMIT fuses to
TakeOrderedAndProject (≙ TransformTopN/OpTopN), the tiny equivalence
mapping broadcasts (≙ substitution join), and scans prune columns."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from jena_spark import terms as TM  # noqa: E402
from jena_spark.queries import graph as G  # noqa: E402


@pytest.fixture(scope="module")
def triples_parquet(spark, transcripts_df, tmp_path_factory):
    from jena_spark.pipeline.canonicalize import canonicalize_triples
    from jena_spark.pipeline.extract import raw_triples

    path = str(tmp_path_factory.mktemp("plans") / "triples")
    canonicalize_triples(raw_triples(transcripts_df)).write.parquet(path)
    return spark.read.parquet(path)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_find_pushes_predicates_to_scan(triples_parquet):
    df = G.find(triples_parquet, p=TM.P_MENTIONS)
    plan = _plan(df)
    assert "PushedFilters: [" in plan and "p_val" in plan.split("PushedFilters")[1][:200]


def test_find_prunes_columns(triples_parquet):
    df = G.find(triples_parquet, p=TM.P_ROLE).select("s_val")
    plan = _plan(df)
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    # the scan must not read the unused object metadata columns
    assert "o_datatype" not in read_schema and "o_lang" not in read_schema


def test_topn_fuses_to_take_ordered(triples_parquet):
    df = (
        triples_parquet.groupBy("p_val").count()
        .orderBy(F.desc("count")).limit(5)
    )
    assert "TakeOrderedAndProject" in _plan(df)


def test_canonicalize_mapping_broadcasts(spark, transcripts_df):
    from jena_spark.pipeline.canonicalize import canonicalize_triples
    from jena_spark.pipeline.extract import raw_triples

    plan = _plan(canonicalize_triples(raw_triples(transcripts_df)))
    assert "BroadcastHashJoin" in plan


def test_whole_stage_codegen_covers_find(triples_parquet):
    # "*(n)" prefixes mark WholeStageCodegen spans in executedPlan text
    plan = _plan(G.find(triples_parquet, p=TM.P_TEXT))
    assert "*(1) Filter" in plan or "WholeStageCodegen" in plan


def test_fused_construction_plan_shape(spark, transcripts_df):
    """The deployment hot path: rep-dim joins broadcast (no shuffle for
    entity linking), exactly ONE wide mention dedup + ONE narrow
    (conv, turn, rep) dedup — no full-width string dedup anywhere."""
    from jena_spark.pipeline.canonicalize import construct_canonical

    plan = _plan(construct_canonical(transcripts_df))
    assert plan.count("BroadcastHashJoin") >= 2  # rep_dim for edges + labels
    assert "SortMergeJoin" not in plan
    # dedup exchanges hash on narrow columns, never on o_val/s_val strings
    for frag in plan.split("Exchange hashpartitioning(")[1:]:
        keycols = frag.split(")")[0]
        assert "o_val" not in keycols and "s_val" not in keycols, keycols


def test_encoded_triples_plan_is_narrow(spark, transcripts_df):
    """The encoded triple stream must not shuffle: ids are computed in
    the narrow projection (allocator-free content hashes)."""
    from jena_spark.pipeline.encoded import construct_canonical_encoded

    triples_enc, node_dict = construct_canonical_encoded(transcripts_df)
    # structure branch = first union child; it must contain no Exchange
    plan = _plan(triples_enc)
    structure_branch = plan.split("ArrowEvalPython")[0]
    assert "xxhash64" in plan.lower() or "XxHash64" in plan
    # node dictionary dedup keys on the 8-byte id, not the term strings
    nplan = _plan(node_dict)
    dedup_keys = [
        frag.split(")")[0]
        for frag in nplan.split("Exchange hashpartitioning(")[1:]
    ]
    assert any("node_id" in k for k in dedup_keys)
    assert all("val" not in k.split(",")[0] for k in dedup_keys)


def test_path_closure_iterates_on_ids(spark, transcripts_df):
    """one_or_more's join runs on 64-bit ids (TDB posture): the join
    keys in the closure plan are long-typed id columns, not term
    strings."""
    from jena_spark.pipeline.canonicalize import construct_canonical
    from jena_spark.queries import paths as P

    t = construct_canonical(transcripts_df).select(*TM.TERM_COLS).limit(500)
    closed = P.one_or_more(P.link(t, TM.P_HAS_TURN))
    plan = _plan(closed)
    # final decode joins bring strings back; the closure core joined on
    # src/dst longs — visible as join keys named src/dst (bigint)
    assert "src" in plan and "dst" in plan


def test_fp_ifp_star_is_single_pass(spark):
    """owl_functional_sameas elects representatives with a window min:
    the plan must contain NO SortMergeJoin and no second scan of the
    witness table per rule (the groupBy+join-back shape it replaces
    scanned and shuffled twice)."""
    from jena_spark.pipeline.inference import (
        OWL_INVERSE_FUNCTIONAL,
        owl_functional_sameas,
    )

    rows = [("iri", "http://v/k", TM.RDF_TYPE, "iri",
             OWL_INVERSE_FUNCTIONAL, None, None)]
    rows += [("iri", f"http://v/a{i}", "http://v/k", "literal",
              f"key{i % 3}", None, None) for i in range(30)]
    t = spark.createDataFrame(
        rows, "s_kind string, s_val string, p_val string, o_kind string,"
              " o_val string, o_datatype string, o_lang string")
    plan = _plan(owl_functional_sameas(t))
    assert "SortMergeJoin" not in plan
    assert "Window" in plan
    # one scan for the declaration collect happens eagerly; the PLAN
    # itself scans the source once per rule family (ifp only here)
    assert plan.count("Scan ExistingRDD") <= 2  # witness scan + broadcast dim


def test_chunk_documents_is_map_only(spark):
    """Scale invariant: sliding-window chunking is one narrow pass —
    split, integer chunk arithmetic, explode, slice; NO Exchange and
    no Python anywhere in the physical plan."""
    from jena_spark.data.pack import chunk_documents

    d = spark.createDataFrame(
        [(i, "tok " * 40) for i in range(8)], "doc_id long, text string")
    plan = chunk_documents(d, chunk_tokens=8, overlap=2)._jdf \
        .queryExecution().executedPlan().toString()
    assert "Generate" in plan            # the explode
    assert "Exchange" not in plan, plan  # map-only
    assert "Python" not in plan, plan    # whole-stage codegen


def test_kmeans_final_assignment_is_map_only(spark):
    """kmeans' returned frame assigns against driver-collected
    centroid literals: one narrow pass over the (checkpointed) corpus,
    no Exchange in the final plan (the update shuffles only k*dim
    rows inside the loop, which this plan no longer contains)."""
    from jena_spark.data.similarity import kmeans

    e = spark.createDataFrame(
        [(i, [float(i % 3), float((i * 7) % 5), 1.0]) for i in range(12)],
        "vec_id long, embedding array<float>")
    out, cents = kmeans(e, k=3, n_iter=1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "Python" not in plan, plan
    assert len(cents) == 3


def test_sft_examples_single_conv_exchange_no_python(spark):
    """sft_examples is ONE window pass per conversation: the physical
    plan has exactly one hash-partition Exchange (conv_id) and no
    Python — context assembly is higher-order array codegen."""
    from jena_spark.data.sft import sft_examples

    t = spark.createDataFrame(
        [("c%d" % (i % 4), i // 4, "assistant" if i % 2 else "user",
          "w x y") for i in range(40)],
        "conv_id string, turn_idx int, role string, text string")
    plan = sft_examples(t, 16)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Python" not in plan, plan
    n_ex = sum(1 for ln in plan.splitlines()
               if "Exchange hashpartitioning" in ln)
    assert n_ex == 1, plan


def test_epoch_upsample_is_map_only(spark):
    from jena_spark.data.selection import epoch_upsample

    d = spark.createDataFrame(
        [(i, "a") for i in range(16)], "doc_id long, source string")
    plan = epoch_upsample(d, {"a": 2.5})._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "Python" not in plan, plan


def test_importance_resample_takes_ordered(spark):
    """The top-n never globally sorts: TakeOrderedAndProject, no Sort
    + Exchange rangepartitioning pair."""
    from jena_spark.data.selection import importance_resample

    s = spark.createDataFrame(
        [(i, i * 100) for i in range(64)], "doc_id long, score_unats long")
    plan = importance_resample(s, 8)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan
    assert "rangepartitioning" not in plan, plan
