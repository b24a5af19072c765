"""Dictionary encoding — the TDB NodeId strategy on Spark (§1.4, §4.3).

Reference: TDB encodes every Node to a fixed-width 64-bit NodeId and
stores triples as id-tuples (``jena-tdb/.../tdb/store/NodeId.java:115-152``,
node table + SPO/POS/OSP indexes ``sys/Names.java:24-25``); join-heavy
work runs on ids and only result terms are decoded back
(``QueryIteratorIdToNode.java``).

Spark adaptation: the id is a *content hash* (``xxhash64`` over the
four term fields), not a sequence number — so encoding is a pure
per-row projection with NO dictionary-build barrier and NO join:
any executor can encode any row independently, which is what survives
10^12 rows. The dictionary (id -> term) is materialized separately for
decoding and for ad-hoc inspection.

Why it matters: a string triple row is ~250 B (skolem bnode labels,
IRIs, text); the encoded row is 3×8 B + kinds. Shuffle-heavy operators
(BGP self-joins, dedup, closure) move ~10× fewer bytes and compare
fixed-width longs instead of strings. ``tests/test_encode.py`` asserts
encoded query results decode to exactly the string-level results.

Collision policy: 64-bit content hashes collide with probability
~n²/2⁶⁵ (≈3e-6 for 10⁹ distinct terms; at 10¹² terms use
``assert_injective`` and fall back to the 128-bit variant — two
xxhash64 seeds — the same escalation TDB avoids only because it owns a
central allocator, which a shared-nothing encoder cannot have).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from jena_spark.terms import TERM_COLS

_SENTINEL = "\x00"  # xxhash64 skips NULL args; coalesce keeps arity stable

ENC_COLS = ["s_id", "p_id", "o_id"]


def term_id_col(kind: Column, val: Column, datatype: Column, lang: Column) -> Column:
    return F.xxhash64(
        kind, val, F.coalesce(datatype, F.lit(_SENTINEL)), F.coalesce(lang, F.lit(_SENTINEL))
    )


def const_term_id(kind: str, val: str, datatype: str | None = None,
                  lang: str | None = None) -> Column:
    """Id of a constant term — Catalyst constant-folds this, so an
    encoded pattern scan filters on a literal long."""
    return term_id_col(F.lit(kind), F.lit(val),
                       F.lit(datatype).cast("string"), F.lit(lang).cast("string"))


def encode_triples(triples: DataFrame) -> DataFrame:
    """Triple rows -> (s_id, p_id, o_id) id-tuples. Pure projection —
    no shuffle, no dictionary dependency."""
    extra = [c for c in triples.columns if c not in TERM_COLS]
    return triples.select(
        term_id_col(F.col("s_kind"), F.col("s_val"), F.lit(None), F.lit(None)).alias("s_id"),
        term_id_col(F.lit("iri"), F.col("p_val"), F.lit(None), F.lit(None)).alias("p_id"),
        term_id_col(F.col("o_kind"), F.col("o_val"), F.col("o_datatype"), F.col("o_lang")).alias("o_id"),
        *extra,
    )


def node_dictionary(triples: DataFrame) -> DataFrame:
    """(node_id, kind, val, datatype, lang) — one row per distinct term
    (the TDB node table)."""
    nodes = (
        triples.select(
            F.col("s_kind").alias("kind"), F.col("s_val").alias("val"),
            F.lit(None).cast("string").alias("datatype"),
            F.lit(None).cast("string").alias("lang"),
        )
        .unionByName(triples.select(
            F.lit("iri").alias("kind"), F.col("p_val").alias("val"),
            F.lit(None).cast("string").alias("datatype"),
            F.lit(None).cast("string").alias("lang"),
        ))
        .unionByName(triples.select(
            F.col("o_kind").alias("kind"), F.col("o_val").alias("val"),
            F.col("o_datatype").alias("datatype"), F.col("o_lang").alias("lang"),
        ))
        .dropDuplicates(["kind", "val", "datatype", "lang"])
    )
    return nodes.select(
        term_id_col(F.col("kind"), F.col("val"), F.col("datatype"), F.col("lang")).alias("node_id"),
        "kind", "val", "datatype", "lang",
    )


def assert_injective(dictionary: DataFrame) -> None:
    """Fail fast on a 64-bit collision (escalate to 128-bit ids then)."""
    dup = dictionary.groupBy("node_id").count().where(F.col("count") > 1).limit(1)
    if not dup.isEmpty():
        raise ValueError(
            "xxhash64 node-id collision detected — use 128-bit ids "
            "(two xxhash64 seeds) for this corpus"
        )


def decode_triples(encoded: DataFrame, dictionary: DataFrame) -> DataFrame:
    """Id-tuples -> term rows (QueryIteratorIdToNode role). Three joins
    against the dictionary; at scale, decode only final results, never
    intermediates."""
    d = dictionary
    s = d.select(F.col("node_id").alias("s_id"), F.col("kind").alias("s_kind"),
                 F.col("val").alias("s_val"))
    p = d.select(F.col("node_id").alias("p_id"), F.col("val").alias("p_val"))
    o = d.select(F.col("node_id").alias("o_id"), F.col("kind").alias("o_kind"),
                 F.col("val").alias("o_val"), F.col("datatype").alias("o_datatype"),
                 F.col("lang").alias("o_lang"))
    return (
        encoded.join(s, "s_id").join(p, "p_id").join(o, "o_id")
        .select(*TERM_COLS)
    )


def find_encoded(
    encoded: DataFrame,
    s: tuple | None = None, p: tuple | None = None, o: tuple | None = None,
) -> DataFrame:
    """Pattern scan on the id table: each bound position is one long
    equality against a constant-folded hash — the encoded analog of
    ``Graph.find`` with a much cheaper comparison and better min/max
    pruning on sorted id columns."""
    cond = F.lit(True)
    if s is not None:
        cond = cond & (F.col("s_id") == const_term_id(*s))
    if p is not None:
        cond = cond & (F.col("p_id") == const_term_id("iri", p if isinstance(p, str) else p[1]))
    if o is not None:
        cond = cond & (F.col("o_id") == const_term_id(*o))
    return encoded.where(cond)
