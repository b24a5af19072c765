"""Bucketed encoded store (TDB SPO/OSP index posture): correctness of
the layout round-trip and — the point — plan-level proof that joins on
the bucket key run with ZERO Exchange operators."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from jena_spark import terms as TM  # noqa: E402
from jena_spark.pipeline.bucketed import (  # noqa: E402
    bucketed_table,
    star_join_bucketed,
    write_bucketed_store,
)
from jena_spark.pipeline.encode import const_term_id  # noqa: E402
from jena_spark.pipeline.encoded import construct_canonical_encoded  # noqa: E402


@pytest.fixture(scope="module")
def store(spark, transcripts_df, tmp_path_factory):
    triples_enc, node_dict = construct_canonical_encoded(transcripts_df)
    base = str(tmp_path_factory.mktemp("bstore"))
    tables = write_bucketed_store(triples_enc, "kg_test", base, n_buckets=8,
                                  paths=("spo", "osp", "pos"))
    return triples_enc, tables


def _pid(spark, iri: str) -> int:
    return spark.range(1).select(
        const_term_id("iri", iri).alias("p")).collect()[0]["p"]


@pytest.fixture()
def no_broadcast(spark):
    """Disable broadcast joins so the assertions compare shuffle vs
    bucket layout (at 100 TB neither triple-table side broadcasts —
    small local inputs would otherwise take the broadcast path and
    mask the property under test)."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
                   str(64 * 1024 * 1024))


def test_roundtrip_both_paths(spark, store):
    triples_enc, tables = store
    want = {tuple(r) for r in
            triples_enc.select("s_id", "p_id", "o_id").collect()}
    for ap in ("spo", "osp"):
        got = {tuple(r) for r in
               bucketed_table(spark, "kg_test", ap)
               .select("s_id", "p_id", "o_id").collect()}
        assert got == want, ap


def test_star_join_no_exchange(spark, store, no_broadcast):
    """The flagship property: a 3-way subject-star join over the
    bucketed SPO table plans with NO Exchange (shuffle) at all —
    the bucketing replaces it."""
    pids = [_pid(spark, p) for p in (TM.P_ROLE, TM.P_TEXT, TM.P_TS)]
    out = star_join_bucketed(spark, "kg_test", pids)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    # and it's correct: every turn has role+text+ts
    triples_enc, _ = store
    n_turns = (triples_enc.where(F.col("p_id") == pids[0]).count())
    assert out.count() == n_turns


def test_self_join_on_bucket_key_no_exchange(spark, store, no_broadcast):
    t = bucketed_table(spark, "kg_test", "spo")
    a = t.select("s_id", F.col("o_id").alias("oa"))
    b = t.select("s_id", F.col("o_id").alias("ob"))
    plan = a.join(b, "s_id")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_object_path_join_no_exchange(spark, store, no_broadcast):
    """s-o chain: mentions edges (object = entity id) joined to label
    subjects through the OSP table on the object key."""
    t_osp = bucketed_table(spark, "kg_test", "osp")
    pid_m = _pid(spark, TM.P_MENTIONS)
    edges = t_osp.where(F.col("p_id") == pid_m).select("o_id")
    more = t_osp.where(F.col("p_id") == pid_m).select(
        "o_id", F.col("s_id").alias("turn"))
    plan = edges.join(more, "o_id")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_unbucketed_baseline_does_shuffle(spark, store, no_broadcast):
    """Sanity check that the assertion above is meaningful: the SAME
    join over the raw (unbucketed) frame DOES plan an Exchange."""
    triples_enc, _ = store
    pids = [_pid(spark, p) for p in (TM.P_ROLE, TM.P_TEXT)]
    a = triples_enc.where(F.col("p_id") == pids[0]).select(
        "s_id", F.col("o_id").alias("oa"))
    b = triples_enc.where(F.col("p_id") == pids[1]).select(
        "s_id", F.col("o_id").alias("ob"))
    plan = a.join(b, "s_id")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in plan


def test_reregister_store_keeps_no_exchange(spark, store, tmp_path, no_broadcast):
    """Deployment restart: drop the catalog entries, re-declare the
    on-disk layout with register_bucketed_store, and the no-shuffle
    join property must survive (the parquet + declared bucket spec is
    the durable artifact, not the session catalog)."""
    import re

    from jena_spark.pipeline.bucketed import register_bucketed_store

    # find where the store fixture wrote the spo table
    loc = spark.sql("DESCRIBE TABLE EXTENDED kg_test_spo").collect()
    path = next(r["data_type"] for r in loc if r["col_name"] == "Location")
    base = re.sub(r"/spo$", "", path.replace("file:", ""))

    spark.sql("DROP TABLE kg_test_spo")
    spark.sql("DROP TABLE kg_test_osp")
    register_bucketed_store(spark, "kg_test", base, n_buckets=8)

    t = bucketed_table(spark, "kg_test", "spo")
    a = t.select("s_id", F.col("o_id").alias("oa"))
    b = t.select("s_id", F.col("o_id").alias("ob"))
    joined = a.join(b, "s_id")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert joined.count() > 0


# --- POS predicate-led access path (Names.java:24) ---------------------------


def test_pos_roundtrip(spark, store):
    triples_enc, _ = store
    want = {tuple(r) for r in
            triples_enc.select("s_id", "p_id", "o_id").collect()}
    got = {tuple(r) for r in
           bucketed_table(spark, "kg_test", "pos")
           .select("s_id", "p_id", "o_id").collect()}
    assert got == want


def test_po_join_no_exchange(spark, store, no_broadcast):
    """Predicate-led object self-join (subjects sharing an object
    under one predicate — the co-mention shape) over the POS table:
    zero Exchange, and the composite (p_id, o_id) bucket key means
    the hot predicate is spread across ALL buckets (the salt)."""
    from jena_spark.pipeline.bucketed import po_join_bucketed

    pid = _pid(spark, TM.P_MENTIONS)
    out = po_join_bucketed(spark, "kg_test", pid)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    # correctness: sum over objects of C(n_subjects, 2)
    triples_enc, _ = store
    per_o = (triples_enc.where(F.col("p_id") == pid)
             .select("s_id", "o_id").distinct()
             .groupBy("o_id").count().collect())
    want = sum(r["count"] * (r["count"] - 1) // 2 for r in per_o)
    # distinct (s,o) pairs in the data (raw_triples is dedup-free by
    # construction so the table IS distinct already)
    assert out.count() == want


def test_pos_unbucketed_baseline_shuffles(spark, store, no_broadcast):
    triples_enc, _ = store
    pid = _pid(spark, TM.P_MENTIONS)
    t = triples_enc.where(F.col("p_id") == pid)
    a = t.select("p_id", "o_id", F.col("s_id").alias("s_a"))
    b = t.select("p_id", "o_id", F.col("s_id").alias("s_b"))
    plan = (a.join(b, ["p_id", "o_id"])
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" in plan


def test_pos_reregister_keeps_no_exchange(spark, store, no_broadcast):
    """Restart path for the POS layout: re-declare the composite
    bucket spec and the zero-Exchange property survives."""
    import re

    from jena_spark.pipeline.bucketed import (
        po_join_bucketed, register_bucketed_store)

    loc = spark.sql("DESCRIBE TABLE EXTENDED kg_test_pos").collect()
    path = next(r["data_type"] for r in loc if r["col_name"] == "Location")
    base = re.sub(r"/pos$", "", path.replace("file:", ""))
    spark.sql("DROP TABLE kg_test_pos")
    register_bucketed_store(spark, "kg_test", base, n_buckets=8,
                            paths=("pos",))
    pid = _pid(spark, TM.P_MENTIONS)
    out = po_join_bucketed(spark, "kg_test", pid)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert out.count() > 0


# --- GSPO quad access path (Names.java:27-28) --------------------------------

@pytest.fixture(scope="module")
def quad_store(spark, transcripts_df, tmp_path_factory):
    """Encoded quads: each conv's triples live in a graph named by the
    conv IRI — the natural GRAPH partitioning of the corpus."""
    from jena_spark.pipeline.bucketed import encode_quads, write_bucketed_quads

    triples_enc, _ = construct_canonical_encoded(transcripts_df)
    # rebuild string quads from the pipeline's string surface instead:
    # graph = conv IRI derived from conv_id (kept by the encoder)
    from jena_spark.pipeline.canonicalize import construct_canonical
    strings = construct_canonical(transcripts_df)
    quads = strings.withColumn(
        "graph", F.concat(F.lit(TM.NS_CONV), F.col("conv_id")))
    quads_enc = encode_quads(quads)
    base = str(tmp_path_factory.mktemp("qstore"))
    tables = write_bucketed_quads(quads_enc, "kgq_test", base, n_buckets=8)
    return quads_enc, tables


def test_quads_roundtrip(spark, quad_store):
    quads_enc, _ = quad_store
    want = {tuple(r) for r in
            quads_enc.select("g_id", "s_id", "p_id", "o_id").collect()}
    got = {tuple(r) for r in
           bucketed_table(spark, "kgq_test", "gspo")
           .select("g_id", "s_id", "p_id", "o_id").collect()}
    assert got == want


def test_graph_star_join_no_exchange(spark, quad_store, no_broadcast):
    """The done-criterion: a graph-scoped 3-way subject-star join over
    the GSPO table plans with ZERO Exchange."""
    from jena_spark.pipeline.bucketed import star_join_bucketed_quads

    pids = [_pid(spark, p) for p in (TM.P_ROLE, TM.P_TEXT, TM.P_TS)]
    out = star_join_bucketed_quads(spark, "kgq_test", pids)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    # correct: every turn star matches within its conv graph
    quads_enc, _ = quad_store
    n_turns = quads_enc.where(F.col("p_id") == pids[0]).count()
    assert out.count() == n_turns

    # bound GRAPH: pick one graph id, restrict, still zero Exchange
    some_g = quads_enc.select("g_id").first()["g_id"]
    bound = star_join_bucketed_quads(spark, "kgq_test", pids, g_id=some_g)
    plan_b = bound._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan_b, plan_b
    assert 0 < bound.count() <= n_turns


def test_quads_unbucketed_baseline_shuffles(spark, quad_store, no_broadcast):
    quads_enc, _ = quad_store
    pids = [_pid(spark, p) for p in (TM.P_ROLE, TM.P_TEXT)]
    a = quads_enc.where(F.col("p_id") == pids[0]).select(
        "g_id", "s_id", F.col("o_id").alias("oa"))
    b = quads_enc.where(F.col("p_id") == pids[1]).select(
        "g_id", "s_id", F.col("o_id").alias("ob"))
    plan = a.join(b, ["g_id", "s_id"])._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" in plan


def test_quads_reregister_keeps_no_exchange(spark, quad_store, no_broadcast):
    import re

    from jena_spark.pipeline.bucketed import (
        register_bucketed_quads,
        star_join_bucketed_quads,
    )

    loc = spark.sql("DESCRIBE TABLE EXTENDED kgq_test_gspo").collect()
    path = next(r["data_type"] for r in loc if r["col_name"] == "Location")
    base = re.sub(r"/gspo$", "", path.replace("file:", ""))
    spark.sql("DROP TABLE kgq_test_gspo")
    register_bucketed_quads(spark, "kgq_test", base, n_buckets=8)

    pids = [_pid(spark, p) for p in (TM.P_ROLE, TM.P_TEXT)]
    out = star_join_bucketed_quads(spark, "kgq_test", pids)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert out.count() > 0


def test_default_graph_sentinel(spark):
    """Null graph columns encode as Quad.defaultGraphIRI's id."""
    from jena_spark.pipeline.bucketed import DEFAULT_GRAPH_IRI, encode_quads

    rows = [("iri", "http://e/s", "http://e/p", "iri", "http://e/o",
             None, None, None),
            ("iri", "http://e/s", "http://e/p", "iri", "http://e/o",
             None, None, "http://e/g")]
    q = spark.createDataFrame(
        rows, "s_kind string, s_val string, p_val string, o_kind string,"
              "o_val string, o_datatype string, o_lang string, graph string")
    enc = encode_quads(q).collect()
    want_default = spark.range(1).select(
        const_term_id("iri", DEFAULT_GRAPH_IRI).alias("g")
    ).collect()[0]["g"]
    gids = {r["g_id"] for r in enc}
    assert want_default in gids and len(gids) == 2


# --- GPOS quad access path (Names.java:27, predicate-led) --------------------


@pytest.fixture(scope="module")
def gpos_store(spark, quad_store, tmp_path_factory):
    from jena_spark.pipeline.bucketed import write_bucketed_quads

    quads_enc, _ = quad_store
    base = str(tmp_path_factory.mktemp("gposstore"))
    write_bucketed_quads(quads_enc, "kgp_test", base, n_buckets=8,
                         paths=("gpos",))
    return quads_enc


def test_gpos_roundtrip(spark, gpos_store):
    want = {tuple(r) for r in
            gpos_store.select("g_id", "s_id", "p_id", "o_id").collect()}
    got = {tuple(r) for r in
           bucketed_table(spark, "kgp_test", "gpos")
           .select("g_id", "s_id", "p_id", "o_id").collect()}
    assert got == want


def test_gpo_join_no_exchange(spark, gpos_store, no_broadcast):
    """Graph-scoped predicate-led self-join over GPOS: zero Exchange,
    correct pair counts per (graph, predicate, object) group."""
    from jena_spark.pipeline.bucketed import gpo_join_bucketed_quads

    pid = _pid(spark, TM.P_MENTIONS)
    out = gpo_join_bucketed_quads(spark, "kgp_test", p_id=pid)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    per_go = (gpos_store.where(F.col("p_id") == pid)
              .select("g_id", "s_id", "o_id").distinct()
              .groupBy("g_id", "o_id").count().collect())
    want = sum(r["count"] * (r["count"] - 1) // 2 for r in per_go)
    assert out.count() == want


def test_gpos_unbucketed_baseline_shuffles(spark, gpos_store, no_broadcast):
    pid = _pid(spark, TM.P_MENTIONS)
    t = gpos_store.where(F.col("p_id") == pid)
    a = t.select("g_id", "p_id", "o_id", F.col("s_id").alias("s_a"))
    b = t.select("g_id", "p_id", "o_id", F.col("s_id").alias("s_b"))
    plan = (a.join(b, ["g_id", "p_id", "o_id"])
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" in plan
