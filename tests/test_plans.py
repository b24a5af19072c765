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
