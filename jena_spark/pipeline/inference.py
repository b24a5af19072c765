"""RDFS forward-chaining inference (rule reasoner parity beyond sameAs).

Reference: Jena's RDFS rule set (``jena-core/src/main/resources/etc/
rdfs.rules``, evaluated by ``reasoner/rulesys/FBRuleReasoner.java``) —
the ρdf core implemented here:

  rdfs5 : (p1 subPropertyOf p2), (p2 subPropertyOf p3) -> (p1 subPropertyOf p3)
  rdfs7 : (p1 subPropertyOf p2), (s p1 o)              -> (s p2 o)
  rdfs2 : (p domain c), (s p o)                        -> (s rdf:type c)
  rdfs3 : (p range  c), (s p o), o iri/bnode           -> (o rdf:type c)
  rdfs11: (c1 subClassOf c2), (c2 subClassOf c3)       -> (c1 subClassOf c3)
  rdfs9 : (c1 subClassOf c2), (s rdf:type c1)          -> (s rdf:type c2)

Spark-first design (100 TB posture): the schema (TBox — subClassOf /
subPropertyOf / domain / range triples) is orders of magnitude smaller
than the instance data, so its transitive closures are computed
driver-side (union of reachability over a dict-graph) and BROADCAST;
every instance rule is then a broadcast join — zero shuffles beyond the
final set-union dedup of derived triples. This is the classic
stratification: with a CLOSED TBox, rdfs7 -> {rdfs2, rdfs3} -> rdfs9
applied in sequence reaches the fixpoint in one pass for schemas where
rdf:type itself is not sub-property-related (Jena's hybrid reasoner
makes the same split: TBox saturation, then ABox rule application).
A guard raises if rdf:type appears as a subPropertyOf member so the
assumption fails loudly rather than silently under-entailing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jena_spark import terms as TM

RDFS = "http://www.w3.org/2000/01/rdf-schema#"
RDFS_SUBCLASS = RDFS + "subClassOf"
RDFS_SUBPROP = RDFS + "subPropertyOf"
RDFS_DOMAIN = RDFS + "domain"
RDFS_RANGE = RDFS + "range"

_SCHEMA_PREDS = [RDFS_SUBCLASS, RDFS_SUBPROP, RDFS_DOMAIN, RDFS_RANGE]


def _transitive_close(pairs: set[tuple[str, str]]) -> set[tuple[str, str]]:
    """Driver-side transitive closure of a tiny relation (TBox)."""
    closed = set(pairs)
    changed = True
    while changed:
        changed = False
        for a, b in list(closed):
            for c, d in list(closed):
                if b == c and (a, d) not in closed:
                    closed.add((a, d))
                    changed = True
    return closed


def _null_s():
    return F.lit(None).cast("string")


def _schema(triples: DataFrame) -> dict[str, list[tuple[str, str]]]:
    rows = (
        triples.where(F.col("p_val").isin(_SCHEMA_PREDS))
        .select("p_val", "s_val", "o_val")
        .collect()
    )
    out: dict[str, list[tuple[str, str]]] = {p: [] for p in _SCHEMA_PREDS}
    for r in rows:
        out[r["p_val"]].append((r["s_val"], r["o_val"]))
    return out


def rdfs_closure(triples: DataFrame) -> DataFrame:
    """Input triples + all ρdf-entailed triples (set semantics).

    Derived triples carry NULL graph/conv_id lineage columns when the
    input has them (they belong to no single conversation — same policy
    as the label/sameAs emission rules).
    """
    spark = triples.sparkSession
    schema = _schema(triples)

    sub_prop = _transitive_close(set(schema[RDFS_SUBPROP]))
    sub_class = _transitive_close(set(schema[RDFS_SUBCLASS]))
    if any(TM.RDF_TYPE in e for e in sub_prop):
        raise ValueError(
            "rdf:type participates in subPropertyOf — the stratified "
            "single-pass evaluation is unsound for this schema; "
            "saturate with an iterative fixpoint instead"
        )

    def _dim(pairs, a: str, b: str) -> DataFrame:
        rows = sorted(pairs) or None
        if rows is None:
            return spark.createDataFrame([], f"{a} string, {b} string")
        return spark.createDataFrame(rows, f"{a} string, {b} string")

    sp = F.broadcast(_dim(sub_prop, "p_sub", "p_super"))
    sc = F.broadcast(_dim(sub_class, "c_sub", "c_super"))
    dom = F.broadcast(_dim(set(schema[RDFS_DOMAIN]), "p_dom", "c_dom"))
    rng = F.broadcast(_dim(set(schema[RDFS_RANGE]), "p_rng", "c_rng"))

    base = triples.select(*TM.TERM_COLS)

    # rdfs5/rdfs11 on the closed TBox dims -> new schema triples
    schema_derived = (
        sp.select(
            F.lit("iri").alias("s_kind"), F.col("p_sub").alias("s_val"),
            F.lit(RDFS_SUBPROP).alias("p_val"),
            F.lit("iri").alias("o_kind"), F.col("p_super").alias("o_val"),
            _null_s().alias("o_datatype"), _null_s().alias("o_lang"),
        )
        .unionByName(sc.select(
            F.lit("iri").alias("s_kind"), F.col("c_sub").alias("s_val"),
            F.lit(RDFS_SUBCLASS).alias("p_val"),
            F.lit("iri").alias("o_kind"), F.col("c_super").alias("o_val"),
            _null_s().alias("o_datatype"), _null_s().alias("o_lang"),
        ))
    )

    # rdfs7: property inheritance (broadcast join on p_val)
    inherited = (
        base.join(sp, base["p_val"] == sp["p_sub"])
        .select("s_kind", "s_val", F.col("p_super").alias("p_val"),
                "o_kind", "o_val", "o_datatype", "o_lang")
    )
    abox = base.unionByName(inherited)

    # rdfs2/rdfs3: domain/range typing over base + inherited triples
    typed_dom = (
        abox.join(dom, abox["p_val"] == dom["p_dom"])
        .select("s_kind", "s_val", F.lit(TM.RDF_TYPE).alias("p_val"),
                F.lit("iri").alias("o_kind"), F.col("c_dom").alias("o_val"),
                _null_s().alias("o_datatype"), _null_s().alias("o_lang"))
    )
    typed_rng = (
        abox.where(F.col("o_kind").isin("iri", "bnode"))
        .join(rng, abox["p_val"] == rng["p_rng"])
        .select(F.col("o_kind").alias("s_kind"), F.col("o_val").alias("s_val"),
                F.lit(TM.RDF_TYPE).alias("p_val"),
                F.lit("iri").alias("o_kind"), F.col("c_rng").alias("o_val"),
                _null_s().alias("o_datatype"), _null_s().alias("o_lang"))
    )
    types = (
        abox.where(F.col("p_val") == TM.RDF_TYPE)
        .unionByName(typed_dom).unionByName(typed_rng)
    )

    # rdfs9: class inheritance over ALL type triples (closed subClassOf)
    super_types = (
        types.join(sc, types["o_val"] == sc["c_sub"])
        .select("s_kind", "s_val", "p_val",
                F.lit("iri").alias("o_kind"), F.col("c_super").alias("o_val"),
                _null_s().alias("o_datatype"), _null_s().alias("o_lang"))
    )

    return (
        abox.unionByName(schema_derived)
        .unionByName(typed_dom).unionByName(typed_rng).unionByName(super_types)
        .dropDuplicates(TM.TERM_COLS)
    )
