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


# --- OWL property rules (rule reasoner, owl-fb.rules) -----------------------

OWL = "http://www.w3.org/2002/07/owl#"
OWL_INVERSE = OWL + "inverseOf"
OWL_SYMMETRIC = OWL + "SymmetricProperty"
OWL_TRANSITIVE = OWL + "TransitiveProperty"


def owl_property_closure(triples: DataFrame, max_iter: int = 30) -> DataFrame:
    """OWL property-characteristic rules
    (``jena-core/src/main/resources/etc/owl-fb.rules`` — inverseOf,
    SymmetricProperty, TransitiveProperty; sameAs is handled by the
    canonicalization CC pass, §2.12):

      inverseOf:  (p owl:inverseOf q), (s p o) -> (o q s)   [both ways]
      symmetric:  (p rdf:type owl:SymmetricProperty), (s p o) -> (o p s)
      transitive: (p rdf:type owl:TransitiveProperty): p-closure

    Scale shape: the property schema is driver-size (broadcast/collect);
    inverse/symmetric are single narrow emissions; the transitive rule
    runs the ENCODED semi-naive closure per declared transitive
    property (``queries/paths.one_or_more`` — id-tuple iteration).
    Inverse/symmetric feed the transitive step (one stratification
    round, sound when property characteristics are not themselves
    derived — which needs no guard because characteristics are schema
    triples this rule set never derives).
    """
    from jena_spark.queries.paths import one_or_more

    spark = triples.sparkSession
    base = triples.select(*TM.TERM_COLS)

    inv_pairs = [
        (r["s_val"], r["o_val"])
        for r in base.where(
            (F.col("p_val") == OWL_INVERSE)
            & (F.col("s_kind") == "iri") & (F.col("o_kind") == "iri")
        ).select("s_val", "o_val").collect()
    ]
    sym_props = [
        r["s_val"]
        for r in base.where(
            (F.col("p_val") == TM.RDF_TYPE) & (F.col("o_val") == OWL_SYMMETRIC)
        ).select("s_val").collect()
    ]
    trans_props = [
        r["s_val"]
        for r in base.where(
            (F.col("p_val") == TM.RDF_TYPE) & (F.col("o_val") == OWL_TRANSITIVE)
        ).select("s_val").collect()
    ]

    derived = []
    inv_map = inv_pairs + [(q, p) for p, q in inv_pairs]  # symmetric rule pair
    if inv_map:
        inv_dim = F.broadcast(spark.createDataFrame(inv_map, "p string, q string"))
        derived.append(
            base.join(inv_dim, base["p_val"] == F.col("p"))
            .select(F.col("o_kind").alias("s_kind"), F.col("o_val").alias("s_val"),
                    F.col("q").alias("p_val"),
                    F.col("s_kind").alias("o_kind"), F.col("s_val").alias("o_val"),
                    F.lit(None).cast("string").alias("o_datatype"),
                    F.lit(None).cast("string").alias("o_lang"))
        )
    if sym_props:
        derived.append(
            base.where(F.col("p_val").isin(sym_props))
            .select(F.col("o_kind").alias("s_kind"), F.col("o_val").alias("s_val"),
                    "p_val",
                    F.col("s_kind").alias("o_kind"), F.col("s_val").alias("o_val"),
                    F.lit(None).cast("string").alias("o_datatype"),
                    F.lit(None).cast("string").alias("o_lang"))
        )
    pre = base
    for d in derived:
        pre = pre.unionByName(d)
    pre = pre.dropDuplicates(TM.TERM_COLS)

    closures = []
    for p in trans_props:
        edges = pre.where(F.col("p_val") == p).select(
            F.col("s_kind").alias("src_kind"), F.col("s_val").alias("src_val"),
            F.col("o_kind").alias("dst_kind"), F.col("o_val").alias("dst_val"),
        )
        closed = one_or_more(edges, max_iter=max_iter)
        closures.append(
            closed.select(
                F.col("src_kind").alias("s_kind"), F.col("src_val").alias("s_val"),
                F.lit(p).alias("p_val"),
                F.col("dst_kind").alias("o_kind"), F.col("dst_val").alias("o_val"),
                F.lit(None).cast("string").alias("o_datatype"),
                F.lit(None).cast("string").alias("o_lang"),
            )
        )
    out = pre
    for c in closures:
        out = out.unionByName(c)
    return out.dropDuplicates(TM.TERM_COLS)
