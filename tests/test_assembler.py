"""Assembler (jena-core ja: vocabulary): config-driven construction of
memory/union/inference models and RDF datasets, with the description
itself written in Turtle and parsed by the engine's own reader."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from jena_spark.pipeline.assembler import (  # noqa: E402
    JA,
    assemble_dataset,
    assemble_model,
)
from jena_spark.sources.turtle import parse_turtle  # noqa: E402

EX = "http://ex.org/"
_SCHEMA = (
    "s_kind string, s_val string, p_val string, o_kind string, o_val string,"
    "o_datatype string, o_lang string"
)


def _config(spark, ttl: str):
    return spark.createDataFrame(parse_turtle(ttl), _SCHEMA)


def test_memory_model_with_literal_and_external_content(spark, tmp_path):
    ext = tmp_path / "extra.ttl"
    ext.write_text(f"<{EX}c> <{EX}p> \"from-file\" .\n")
    cfg = _config(spark, f"""
    @prefix ja: <{JA}> .
    <{EX}m> a ja:MemoryModel ;
        ja:content [ ja:literalContent "<{EX}a> <{EX}p> <{EX}b> ." ] ;
        ja:content [ ja:externalContent <file://{ext}> ] .
    """)
    m = assemble_model(spark, cfg)
    got = {(r["s_val"], r["o_val"]) for r in m.collect()}
    assert got == {(EX + "a", EX + "b"), (EX + "c", "from-file")}


def test_union_and_inf_model(spark):
    cfg = _config(spark, f"""
    @prefix ja: <{JA}> .
    @prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
    <{EX}base> a ja:MemoryModel ;
        ja:content [ ja:literalContent
          "<{EX}dog> rdfs:subClassOf <{EX}animal> . <{EX}rex> a <{EX}dog> ." ] .
    <{EX}extra> a ja:MemoryModel ;
        ja:content [ ja:literalContent "<{EX}rex> <{EX}name> \\"Rex\\" ." ] .
    <{EX}u> a ja:UnionModel ;
        ja:rootModel <{EX}base> ; ja:subModel <{EX}extra> .
    <{EX}inf> a ja:InfModel ;
        ja:baseModel <{EX}u> ;
        ja:reasoner [ ja:reasonerURL
          <http://jena.hpl.hp.com/2003/RDFSRuleReasoner> ] .
    """)
    u = assemble_model(spark, cfg, root=EX + "u")
    assert u.count() == 3
    inf = assemble_model(spark, cfg, root=EX + "inf")
    types = {r["o_val"] for r in inf.where(
        (F.col("s_val") == EX + "rex")
        & (F.col("p_val") == "http://www.w3.org/1999/02/22-rdf-syntax-ns#type")
    ).collect()}
    assert types == {EX + "dog", EX + "animal"}  # rdfs9 entailment


def test_generic_rule_reasoner_inf_model(spark, tmp_path):
    """ja:InfModel with GenericRuleReasonerFactory.URI + ja:rules inline
    text and ja:rulesFrom file (RuleSetAssembler.java) — the rule
    engine wired through the assembler."""
    extra = tmp_path / "more.rules"
    extra.write_text(f"[r2: (?a <{EX}q> ?b) -> (?a <{EX}r> ?b)]\n")
    cfg = _config(spark, f"""
    @prefix ja: <{JA}> .
    <{EX}base> a ja:MemoryModel ;
        ja:content [ ja:literalContent "<{EX}a> <{EX}p> <{EX}b> ." ] .
    <{EX}inf> a ja:InfModel ;
        ja:baseModel <{EX}base> ;
        ja:reasoner [
          ja:reasonerURL <http://jena.hpl.hp.com/2003/GenericRuleReasoner> ;
          ja:rules "[r1: (?a <{EX}p> ?b) -> (?a <{EX}q> ?b)]" ;
          ja:rulesFrom <file:{extra}> ] .
    """)
    inf = assemble_model(spark, cfg, root=EX + "inf")
    preds = {r["p_val"] for r in inf.where(F.col("s_val") == EX + "a").collect()}
    assert preds == {EX + "p", EX + "q", EX + "r"}  # r2 consumes r1's output
    # missing rules -> loud error
    cfg2 = _config(spark, f"""
    @prefix ja: <{JA}> .
    <{EX}base> a ja:MemoryModel ;
        ja:content [ ja:literalContent "<{EX}a> <{EX}p> <{EX}b> ." ] .
    <{EX}inf> a ja:InfModel ;
        ja:baseModel <{EX}base> ;
        ja:reasoner [
          ja:reasonerURL <http://jena.hpl.hp.com/2003/GenericRuleReasoner> ] .
    """)
    with pytest.raises(ValueError, match="ja:rules"):
        assemble_model(spark, cfg2, root=EX + "inf").count()


def test_dataset_and_root_discovery(spark):
    cfg = _config(spark, f"""
    @prefix ja: <{JA}> .
    <{EX}ds> a ja:RDFDataset ;
        ja:defaultGraph <{EX}dg> ;
        ja:namedGraph [ ja:graphName <{EX}g1> ; ja:graph <{EX}m1> ] .
    <{EX}dg> a ja:MemoryModel ;
        ja:content [ ja:literalContent "<{EX}a> <{EX}p> 1 ." ] .
    <{EX}m1> a ja:MemoryModel ;
        ja:content [ ja:literalContent "<{EX}b> <{EX}p> 2 ." ] .
    """)
    # single root: the dataset (dg/m1 are sub-parts, not roots)
    conn = assemble_dataset(spark, cfg)
    assert conn.default_graph().count() == 1
    assert conn.fetch(EX + "g1").count() == 1
    assert {r["graph"] for r in conn.dataset.collect()} == {None, EX + "g1"}


def test_assembler_profile_errors(spark):
    with pytest.raises(ValueError, match="unsupported reasonerURL"):
        assemble_model(spark, _config(spark, f"""
        @prefix ja: <{JA}> .
        <{EX}i> a ja:InfModel ; ja:baseModel <{EX}b> ;
            ja:reasoner [ ja:reasonerURL <http://nope> ] .
        <{EX}b> a ja:MemoryModel .
        """))
    with pytest.raises(ValueError, match="expected exactly one root"):
        assemble_model(spark, _config(spark, f"""
        @prefix ja: <{JA}> .
        <{EX}x> a ja:MemoryModel . <{EX}y> a ja:MemoryModel .
        """))
    with pytest.raises(ValueError, match="literalContent or"):
        assemble_model(spark, _config(spark, f"""
        @prefix ja: <{JA}> .
        <{EX}m> a ja:MemoryModel ; ja:content [ ja:prefix "x" ] .
        """))


def test_cyclic_description_raises(spark):
    cfg = _config(spark, f"""
    @prefix ja: <{JA}> .
    <{EX}m1> a ja:UnionModel ; ja:subModel <{EX}m2> .
    <{EX}m2> a ja:UnionModel ; ja:subModel <{EX}m1> .
    """)
    with pytest.raises(ValueError, match="cyclic"):
        assemble_model(spark, cfg, root=EX + "m1")
