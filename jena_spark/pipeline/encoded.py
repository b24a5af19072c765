"""Encoded (dictionary / NodeId) canonical construction — the TDB
storage posture on Spark.

Reference: TDB never materializes string triples. The store is a node
table (NodeId -> Node) plus triple indexes of fixed-width id-tuples
(``jena-tdb/.../store/NodeId.java:115-152``, node table + SPO/POS/OSP
``sys/Names.java:24-25``); queries run on ids and only final results
decode back (``QueryIteratorIdToNode.java``). This module gives the
construction pipeline the same shape:

* ``construct_canonical_encoded`` emits the canonical triple set as
  ``(s_id, p_id, o_id)`` longs (8 B each vs ~80-230 B of term string),
  plus the node dictionary needed to decode. Ids are the content
  hashes of :mod:`jena_spark.pipeline.encode` (``xxhash64`` over the
  term fields) — allocator-free, any executor encodes any row.
* Decoding ``triples_enc`` through the dictionary with
  :func:`jena_spark.pipeline.encode.decode_triples` reproduces the
  string-level canonical triples byte-for-byte
  (``tests/test_materialize.py`` asserts equality with
  ``canonicalize_triples(raw_triples(...))`` — the oracle-checked
  path).

Why it matters at 10^12 turns: the triple table is the thing that gets
shuffled, bucketed, written and re-joined. At ~27 B/row instead of
~230 B/row, every downstream byte-bound operation (shuffle, cache,
scan, write) moves ~8x less; term strings exist exactly once, in the
node dictionary. This is also what restores *scaling* headroom on
byte-bound hardware: the string pipeline saturates memory bandwidth
long before it saturates cores.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jena_spark import terms as TM
from jena_spark.pipeline.encode import term_id_col

_X = "\x00"  # null sentinel, cf. encode.py


def _null_s():
    return F.lit(None).cast("string")


def _nid(kind, val, datatype=None, lang=None):
    """node id for (kind, val[, datatype, lang]) column expressions."""
    k = F.lit(kind) if isinstance(kind, str) else kind
    d = F.lit(datatype).cast("string") if datatype is None or isinstance(datatype, str) else datatype
    lg = F.lit(lang).cast("string") if lang is None or isinstance(lang, str) else lang
    return term_id_col(k, val, d, lg)


def _node_row(kind, val, datatype=None, lang=None):
    k = F.lit(kind) if isinstance(kind, str) else kind
    d = F.lit(datatype).cast("string") if datatype is None or isinstance(datatype, str) else datatype
    lg = F.lit(lang).cast("string") if lang is None or isinstance(lang, str) else lang
    return F.struct(
        _nid(k, val, d, lg).alias("node_id"),
        k.alias("kind"), val.alias("val"),
        d.alias("datatype"), lg.alias("lang"),
    )


def construct_canonical_encoded(
    transcripts: DataFrame, gazetteer: dict | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Canonical triples as id-tuples + node dictionary.

    Returns ``(triples_enc, node_dict)`` where

    * ``triples_enc``: ``(s_id, p_id, o_id, conv_id)`` — one row per
      canonical triple (same multiset of triples as
      :func:`jena_spark.pipeline.canonicalize.construct_canonical`,
      just encoded); ``conv_id`` retained for bucketing/lineage.
    * ``node_dict``: ``(node_id, kind, val, datatype, lang)`` — one row
      per distinct term, sufficient to decode every id in
      ``triples_enc``.

    Shuffle inventory (the whole point): one narrow mention shuffle,
    one narrow (conv, turn, rep) dedup, one node-dictionary dedup keyed
    on an 8-byte id with map-side combine. The 6x-wider triple stream
    itself is narrow end-to-end and ~27 B/row.
    """
    from jena_spark.pipeline.canonicalize import present_rep_dim
    from jena_spark.pipeline.extract import extract_mentions

    spark = transcripts.sparkSession
    gaz = gazetteer

    # --- structure branch (narrow, unique by construction) ------------------
    conv_iri = TM.conv_iri_col(F.col("conv_id"))
    turn_bnode = TM.skolem_col(
        F.col("conv_id"), F.concat(F.lit("turn-"), F.col("turn_idx").cast("string"))
    )
    idx_lex = TM.canon_integer_col(F.col("turn_idx"))
    ts_lex = TM.canon_datetime_col(F.col("ts"))

    conv_id_ = _nid("iri", conv_iri)
    turn_id_ = _nid("bnode", turn_bnode)

    def _p(p: str):
        return _nid("iri", F.lit(p))

    def _t(s_id, p, o_id):
        return F.struct(s_id.alias("s_id"), _p(p).alias("p_id"), o_id.alias("o_id"))

    elems = F.array(
        _t(conv_id_, TM.P_HAS_TURN, turn_id_),
        _t(turn_id_, TM.P_TURN_INDEX, _nid("literal", idx_lex, TM.XSD_INTEGER)),
        _t(turn_id_, TM.P_ROLE, _nid("literal", F.col("role"))),
        _t(turn_id_, TM.P_TEXT, _nid("literal", F.col("text"))),
        F.when(F.col("tool").isNotNull(),
               _t(turn_id_, TM.P_TOOL, _nid("literal", F.col("tool")))),
        _t(turn_id_, TM.P_TS, _nid("literal", ts_lex, TM.XSD_DATETIME)),
    )
    structure_enc = (
        transcripts.select(F.col("conv_id"), F.explode(elems).alias("t"))
        .where(F.col("t").isNotNull())
        .select("t.s_id", "t.p_id", "t.o_id", "conv_id")
    )

    # --- canonical mention branch (pre-stringification dedup) ---------------
    # rep map derived from the surfaces PRESENT in the data (see
    # present_rep_dim: a full-gazetteer mapping can elect an absent
    # representative and diverge from the data-derived closure).
    mentions = extract_mentions(transcripts, gaz).persist()
    rep_dim = present_rep_dim(mentions, gaz)
    canon_mentions = (
        mentions.join(F.broadcast(rep_dim), "surface")
        .select("conv_id", "turn_idx", "rep")
        .distinct()
    )
    m_bnode = TM.skolem_col(
        F.col("conv_id"), F.concat(F.lit("turn-"), F.col("turn_idx").cast("string"))
    )
    edges_enc = canon_mentions.select(
        _nid("bnode", m_bnode).alias("s_id"),
        _p(TM.P_MENTIONS).alias("p_id"),
        _nid("iri", F.col("rep")).alias("o_id"),
        F.col("conv_id"),
    )
    surfaces = mentions.select("surface").distinct().join(F.broadcast(rep_dim), "surface")
    labels_enc = surfaces.select(
        _nid("iri", F.col("rep")).alias("s_id"),
        _p(TM.RDFS_LABEL).alias("p_id"),
        _nid("literal", F.col("surface")).alias("o_id"),
        _null_s().alias("conv_id"),
    )
    triples_enc = structure_enc.unionByName(edges_enc).unionByName(labels_enc)

    # --- node dictionary (term strings exist exactly once) ------------------
    node_elems = F.array(
        _node_row("iri", conv_iri),
        _node_row("bnode", turn_bnode),
        _node_row("literal", idx_lex, TM.XSD_INTEGER),
        _node_row("literal", F.col("role")),
        _node_row("literal", F.col("text")),
        F.when(F.col("tool").isNotNull(), _node_row("literal", F.col("tool"))),
        _node_row("literal", ts_lex, TM.XSD_DATETIME),
    )
    structure_nodes = (
        transcripts.select(F.explode(node_elems).alias("n"))
        .where(F.col("n").isNotNull())
        .select("n.node_id", "n.kind", "n.val", "n.datatype", "n.lang")
    )
    pred_rows = [
        (p,) for p in (TM.P_HAS_TURN, TM.P_TURN_INDEX, TM.P_ROLE, TM.P_TEXT,
                       TM.P_TOOL, TM.P_TS, TM.P_MENTIONS, TM.RDFS_LABEL)
    ]
    pred_dim = spark.createDataFrame(pred_rows, "val string")
    small_nodes = (
        pred_dim.select(_node_row("iri", F.col("val")).alias("n"))
        .unionByName(surfaces.select(_node_row("iri", F.col("rep")).alias("n")))
        .unionByName(surfaces.select(_node_row("literal", F.col("surface")).alias("n")))
        .select("n.node_id", "n.kind", "n.val", "n.datatype", "n.lang")
    )
    node_dict = (
        structure_nodes.unionByName(small_nodes)
        # 8-byte key, map-side combine absorbs the per-partition dups
        # (role/tool/conv repeats) before the shuffle; same-id rows are
        # identical terms (collision policy: encode.assert_injective).
        .dropDuplicates(["node_id"])
    )
    return triples_enc, node_dict
