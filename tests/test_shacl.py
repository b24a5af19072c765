"""SHACL core validation (jena-shacl analog): each supported
constraint component exercised with conforming AND violating data;
shapes graphs built as plain triple frames."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from jena_spark.queries.shacl import (  # noqa: E402
    RDF_TYPE,
    SH,
    conforms,
    validate,
)

EX = "http://ex.org/"
XSD = "http://www.w3.org/2001/XMLSchema#"

_SCHEMA = (
    "s_kind string, s_val string, p_val string, o_kind string, o_val string,"
    "o_datatype string, o_lang string"
)


def _g(spark, rows):
    return spark.createDataFrame(rows, _SCHEMA)


def _shape_rows(extra):
    """A NodeShape targeting ex:Person with one property shape on
    ex:name carrying `extra` constraint triples (on the bnode _:p)."""
    base = [
        ("iri", EX + "PersonShape", SH + "targetClass", "iri", EX + "Person",
         None, None),
        ("iri", EX + "PersonShape", SH + "property", "bnode", "_:p", None, None),
        ("bnode", "_:p", SH + "path", "iri", EX + "name", None, None),
    ]
    return base + extra


def _person(name_rows):
    return [("iri", EX + "a", RDF_TYPE, "iri", EX + "Person", None, None)] + [
        ("iri", EX + "a", EX + "name", *obj) for obj in name_rows
    ]


def viol(spark, data_rows, shape_extra):
    data = _g(spark, data_rows)
    shapes = _g(spark, _shape_rows(shape_extra))
    return {(r["constraint"], r["value"]) for r in
            validate(data, shapes).collect()}


def test_min_max_count(spark):
    extra = [
        ("bnode", "_:p", SH + "minCount", "literal", "1", XSD + "integer", None),
        ("bnode", "_:p", SH + "maxCount", "literal", "2", XSD + "integer", None),
    ]
    assert viol(spark, _person([("literal", "x", None, None)]), extra) == set()
    assert viol(spark, _person([]), extra) == {("minCount", "0")}
    three = [("literal", v, None, None) for v in "xyz"]
    assert viol(spark, _person(three), extra) == {("maxCount", "3")}


def test_datatype_and_string_semantics(spark):
    extra = [("bnode", "_:p", SH + "datatype", "iri", XSD + "string", None, None)]
    # plain literal IS xsd:string
    assert viol(spark, _person([("literal", "ok", None, None)]), extra) == set()
    # typed-int literal, lang literal, IRI all violate
    assert viol(spark, _person([("literal", "5", XSD + "integer", None)]),
                extra) == {("value", "5")}
    assert viol(spark, _person([("literal", "hi", None, "en")]),
                extra) == {("value", "hi")}
    assert viol(spark, _person([("iri", EX + "o", None, None)]),
                extra) == {("value", EX + "o")}


def test_nodekind_pattern_in_lengths_ranges(spark):
    extra = [
        ("bnode", "_:p", SH + "nodeKind", "iri", SH + "Literal", None, None),
        ("bnode", "_:p", SH + "pattern", "literal", "^[a-z]+$", None, None),
        ("bnode", "_:p", SH + "minLength", "literal", "2", XSD + "integer", None),
        ("bnode", "_:p", SH + "maxLength", "literal", "5", XSD + "integer", None),
    ]
    assert viol(spark, _person([("literal", "abc", None, None)]), extra) == set()
    assert ("value", "ABC") in viol(
        spark, _person([("literal", "ABC", None, None)]), extra)
    assert ("value", "a") in viol(
        spark, _person([("literal", "a", None, None)]), extra)
    assert ("value", "abcdefgh") in viol(
        spark, _person([("literal", "abcdefgh", None, None)]), extra)


def test_numeric_ranges(spark):
    extra = [
        ("bnode", "_:p", SH + "minInclusive", "literal", "1",
         XSD + "integer", None),
        ("bnode", "_:p", SH + "maxExclusive", "literal", "10",
         XSD + "integer", None),
    ]
    ok = [("literal", "1", XSD + "integer", None),
          ("literal", "9.5", XSD + "decimal", None)]
    assert viol(spark, _person(ok), extra) == set()
    assert ("value", "10") in viol(
        spark, _person([("literal", "10", XSD + "integer", None)]), extra)
    assert ("value", "zero") in viol(
        spark, _person([("literal", "zero", None, None)]), extra)


def test_in_and_hasvalue(spark):
    rdf = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    extra = [
        ("bnode", "_:p", SH + "in", "bnode", "_:l1", None, None),
        ("bnode", "_:l1", rdf + "first", "literal", "red", None, None),
        ("bnode", "_:l1", rdf + "rest", "bnode", "_:l2", None, None),
        ("bnode", "_:l2", rdf + "first", "literal", "blue", None, None),
        ("bnode", "_:l2", rdf + "rest", "iri", rdf + "nil", None, None),
        ("bnode", "_:p", SH + "hasValue", "literal", "red", None, None),
    ]
    assert viol(spark, _person([("literal", "red", None, None)]), extra) == set()
    got = viol(spark, _person([("literal", "blue", None, None)]), extra)
    assert got == {("hasValue", None)}
    got = viol(spark, _person([("literal", "green", None, None)]), extra)
    assert ("value", "green") in got and ("hasValue", None) in got


def test_class_constraint_and_inverse_path(spark):
    shapes = _g(spark, [
        ("iri", EX + "S", SH + "targetSubjectsOf", "iri", EX + "owns",
         None, None),
        ("iri", EX + "S", SH + "targetObjectsOf", "iri", EX + "owns",
         None, None),
        ("iri", EX + "S", SH + "property", "bnode", "_:p", None, None),
        ("bnode", "_:p", SH + "path", "iri", EX + "owns", None, None),
        ("bnode", "_:p", SH + "class", "iri", EX + "Thing", None, None),
        ("iri", EX + "S", SH + "property", "bnode", "_:q", None, None),
        ("bnode", "_:q", SH + "path", "bnode", "_:inv", None, None),
        ("bnode", "_:inv", SH + "inversePath", "iri", EX + "owns", None, None),
        ("bnode", "_:q", SH + "maxCount", "literal", "1", XSD + "integer", None),
    ])
    data = _g(spark, [
        ("iri", EX + "u", EX + "owns", "iri", EX + "t1", None, None),
        ("iri", EX + "t1", RDF_TYPE, "iri", EX + "Thing", None, None),
        ("iri", EX + "v", EX + "owns", "iri", EX + "t2", None, None),  # untyped
    ])
    got = {(r["focus"], r["constraint"], r["value"]) for r in
           validate(data, shapes).collect()}
    assert (EX + "v", "value", EX + "t2") in got
    assert all(f != EX + "u" for f, _, _ in got)
    # inverse path: two owners of one thing -> maxCount on ^owns
    data2 = _g(spark, [
        ("iri", EX + "u", EX + "owns", "iri", EX + "t1", None, None),
        ("iri", EX + "v", EX + "owns", "iri", EX + "t1", None, None),
        ("iri", EX + "t1", RDF_TYPE, "iri", EX + "Thing", None, None),
    ])
    got2 = {(r["focus"], r["path"], r["constraint"]) for r in
            validate(data2, shapes).collect()}
    assert (EX + "t1", "^" + EX + "owns", "maxCount") in got2


def test_node_level_constraints_and_target_node(spark):
    shapes = _g(spark, [
        ("iri", EX + "N", SH + "targetNode", "iri", EX + "good", None, None),
        ("iri", EX + "N", SH + "targetNode", "bnode", "_:b", None, None),
        ("iri", EX + "N", SH + "nodeKind", "iri", SH + "IRI", None, None),
    ])
    data = _g(spark, [
        ("iri", EX + "good", EX + "p", "literal", "x", None, None),
    ])
    got = {(r["focus_kind"], r["focus"]) for r in
           validate(data, shapes).collect()}
    assert got == {("bnode", "_:b")}


def test_conforms_and_unsupported(spark):
    shapes = _g(spark, _shape_rows([
        ("bnode", "_:p", SH + "minCount", "literal", "1", XSD + "integer", None),
    ]))
    assert conforms(_g(spark, _person([("literal", "x", None, None)])), shapes)
    with pytest.raises(ValueError, match="unsupported constraint"):
        validate(_g(spark, _person([])), _g(spark, _shape_rows([
            ("bnode", "_:p", SH + "expression", "bnode", "_:ex", None, None),
        ])))
    with pytest.raises(ValueError, match="no node shape"):
        validate(_g(spark, _person([])), _g(spark, [
            ("iri", EX + "x", EX + "p", "literal", "1", None, None)]))


def test_closed_and_ignored_properties(spark):
    """sh:closed (ClosedConstraint.java): predicates outside the
    declared property paths + ignoredProperties violate, with the
    offending predicate as the report path."""
    RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    shapes = _g(spark, _shape_rows([
        ("iri", EX + "PersonShape", SH + "closed", "literal", "true",
         XSD + "boolean", None),
        ("iri", EX + "PersonShape", SH + "ignoredProperties", "bnode", "_:l0",
         None, None),
        ("bnode", "_:l0", RDF + "first", "iri", RDF_TYPE, None, None),
        ("bnode", "_:l0", RDF + "rest", "iri", RDF + "nil", None, None),
    ]))
    data = _g(spark, _person([("literal", "Ada", None, None)]) + [
        ("iri", EX + "a", EX + "nickname", "literal", "A.", None, None),
    ])
    rep = validate(data, shapes).collect()
    assert [(r["path"], r["constraint"], r["value"]) for r in rep] == [
        (EX + "nickname", "closed", "A.")]
    ok = _g(spark, _person([("literal", "Ada", None, None)]))
    assert conforms(ok, shapes)


def test_unique_lang(spark):
    """sh:uniqueLang: two values sharing a language tag violate once
    per (focus, lang)."""
    shapes = _g(spark, _shape_rows([
        ("bnode", "_:p", SH + "uniqueLang", "literal", "true",
         XSD + "boolean", None),
    ]))
    bad = _g(spark, _person([
        ("literal", "Ada", None, "en"), ("literal", "Adah", None, "en"),
        ("literal", "Ada", None, "fr"),
    ]))
    rep = validate(bad, shapes).collect()
    assert [(r["constraint"], r["value"]) for r in rep] == [("uniqueLang", "en")]
    ok = _g(spark, _person([
        ("literal", "Ada", None, "en"), ("literal", "Ada", None, "fr"),
        ("literal", "plain", None, None),
    ]))
    assert conforms(ok, shapes)


def test_pairwise_equals_disjoint_lessthan(spark):
    """sh:equals / sh:disjoint / sh:lessThan[OrEquals]
    (EqualsConstraint.java family): per-focus value-set comparisons."""
    eq_shapes = _g(spark, _shape_rows([
        ("bnode", "_:p", SH + "equals", "iri", EX + "alias", None, None),
    ]))
    data = _g(spark, _person([("literal", "Ada", None, None)]) + [
        ("iri", EX + "a", EX + "alias", "literal", "Lovelace", None, None),
    ])
    rep = validate(data, eq_shapes).collect()
    assert {r["value"] for r in rep} == {"Ada", "Lovelace"}  # sym. difference
    both = _g(spark, _person([("literal", "Ada", None, None)]) + [
        ("iri", EX + "a", EX + "alias", "literal", "Ada", None, None),
    ])
    assert conforms(both, eq_shapes)

    dis_shapes = _g(spark, _shape_rows([
        ("bnode", "_:p", SH + "disjoint", "iri", EX + "alias", None, None),
    ]))
    assert conforms(data, dis_shapes)
    rep = validate(both, dis_shapes).collect()
    assert [(r["constraint"].startswith("disjoint"), r["value"]) for r in rep] \
        == [(True, "Ada")]

    lt_shapes = _g(spark, [
        ("iri", EX + "S", SH + "targetSubjectsOf", "iri", EX + "start", None, None),
        ("iri", EX + "S", SH + "property", "bnode", "_:q", None, None),
        ("bnode", "_:q", SH + "path", "iri", EX + "start", None, None),
        ("bnode", "_:q", SH + "lessThan", "iri", EX + "end", None, None),
    ])
    ok = _g(spark, [
        ("iri", EX + "e1", EX + "start", "literal", "1", XSD + "integer", None),
        ("iri", EX + "e1", EX + "end", "literal", "5", XSD + "integer", None),
    ])
    assert conforms(ok, lt_shapes)
    bad = _g(spark, [
        ("iri", EX + "e2", EX + "start", "literal", "7", XSD + "integer", None),
        ("iri", EX + "e2", EX + "end", "literal", "5", XSD + "integer", None),
        # equal start/end also violates strict lessThan
        ("iri", EX + "e3", EX + "start", "literal", "5", XSD + "integer", None),
        ("iri", EX + "e3", EX + "end", "literal", "5", XSD + "integer", None),
    ])
    rep = validate(bad, lt_shapes).collect()
    assert {(r["focus"], r["value"]) for r in rep} == {
        (EX + "e2", "7"), (EX + "e3", "5")}
    lte_shapes = _g(spark, [
        ("iri", EX + "S", SH + "targetSubjectsOf", "iri", EX + "start", None, None),
        ("iri", EX + "S", SH + "property", "bnode", "_:q", None, None),
        ("bnode", "_:q", SH + "path", "iri", EX + "start", None, None),
        ("bnode", "_:q", SH + "lessThanOrEquals", "iri", EX + "end", None, None),
    ])
    rep = validate(bad, lte_shapes).collect()
    assert {(r["focus"], r["value"]) for r in rep} == {(EX + "e2", "7")}


def test_sparql_constraint_set_based(spark):
    """sh:sparql (SparqlConstraint.java): the SELECT runs ONCE with
    $this as a variable through the engine's own SPARQL front-end and
    joins the focus frame — rows outside the target set do not
    report."""
    select = (f"SELECT ?this ?value WHERE {{ ?this <{EX}name> ?value . "
              f"FILTER (STRLEN(?value) < 3) }}")
    shapes = _g(spark, _shape_rows([]) + [
        ("iri", EX + "PersonShape", SH + "sparql", "bnode", "_:c", None, None),
        ("bnode", "_:c", SH + "select", "literal", select, None, None),
        ("bnode", "_:c", SH + "message", "literal", "name too short", None, None),
    ])
    data = _g(spark, _person([("literal", "Al", None, None)]) + [
        # NOT a Person: same short name, must not report
        ("iri", EX + "z", EX + "name", "literal", "Zo", None, None),
    ])
    rep = validate(data, shapes).collect()
    assert [(r["focus"], r["constraint"], r["value"]) for r in rep] == [
        (EX + "a", "name too short", "Al")]
    ok = _g(spark, _person([("literal", "Ada", None, None)]))
    assert conforms(ok, shapes)


def test_logical_combinators_property_level(spark):
    """sh:or of datatype alternatives (the canonical use), sh:not, and
    sh:xone over value nodes."""
    or_shapes = _g(spark, _shape_rows([
        ("bnode", "_:p", SH + "or", "bnode", "_:l1", None, None),
        ("bnode", "_:l1", "http://www.w3.org/1999/02/22-rdf-syntax-ns#first",
         "bnode", "_:s1", None, None),
        ("bnode", "_:l1", "http://www.w3.org/1999/02/22-rdf-syntax-ns#rest",
         "bnode", "_:l2", None, None),
        ("bnode", "_:l2", "http://www.w3.org/1999/02/22-rdf-syntax-ns#first",
         "bnode", "_:s2", None, None),
        ("bnode", "_:l2", "http://www.w3.org/1999/02/22-rdf-syntax-ns#rest",
         "iri", "http://www.w3.org/1999/02/22-rdf-syntax-ns#nil", None, None),
        ("bnode", "_:s1", SH + "datatype", "iri", XSD + "integer", None, None),
        ("bnode", "_:s2", SH + "datatype", "iri", XSD + "string", None, None),
    ]))
    data = _g(spark, _person([
        ("literal", "42", XSD + "integer", None),     # conforms via s1
        ("literal", "plain", None, None),             # conforms via s2 (RDF 1.1)
        ("literal", "3.14", XSD + "decimal", None),   # violates both
    ]))
    rep = validate(data, or_shapes).collect()
    assert [(r["constraint"], r["value"]) for r in rep] == [("or", "3.14")]

    not_shapes = _g(spark, _shape_rows([
        ("bnode", "_:p", SH + "not", "bnode", "_:n", None, None),
        ("bnode", "_:n", SH + "pattern", "literal", "^secret", None, None),
    ]))
    data2 = _g(spark, _person([
        ("literal", "secret-x", None, None),   # matches inner -> violates not
        ("literal", "public", None, None),
    ]))
    rep = validate(data2, not_shapes).collect()
    assert [(r["constraint"], r["value"]) for r in rep] == [("not", "secret-x")]


def test_sh_node_and_node_level_logic(spark):
    """sh:node: value nodes must conform to a referenced node shape
    (with its own property shape); node-level sh:not on the focus."""
    RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    shapes = _g(spark, [
        ("iri", EX + "S", SH + "targetSubjectsOf", "iri", EX + "knows", None, None),
        ("iri", EX + "S", SH + "property", "bnode", "_:p", None, None),
        ("bnode", "_:p", SH + "path", "iri", EX + "knows", None, None),
        ("bnode", "_:p", SH + "node", "iri", EX + "NamedThing", None, None),
        # referenced shape: must have >=1 ex:name
        ("iri", EX + "NamedThing", SH + "property", "bnode", "_:q", None, None),
        ("bnode", "_:q", SH + "path", "iri", EX + "name", None, None),
        ("bnode", "_:q", SH + "minCount", "literal", "1", XSD + "integer", None),
    ])
    data = _g(spark, [
        ("iri", EX + "a", EX + "knows", "iri", EX + "b", None, None),
        ("iri", EX + "a", EX + "knows", "iri", EX + "c", None, None),
        ("iri", EX + "b", EX + "name", "literal", "B", None, None),
        # c has no name -> a violates via the value node c
    ])
    rep = validate(data, shapes).collect()
    assert [(r["focus"], r["constraint"], r["value"]) for r in rep] == [
        (EX + "a", "node", EX + "c")]
    # node-level sh:not: Persons must NOT conform to "has an ex:ban"
    shapes2 = _g(spark, _shape_rows([
        ("iri", EX + "PersonShape", SH + "not", "bnode", "_:n", None, None),
        ("bnode", "_:n", SH + "property", "bnode", "_:np", None, None),
        ("bnode", "_:np", SH + "path", "iri", EX + "ban", None, None),
        ("bnode", "_:np", SH + "minCount", "literal", "1", XSD + "integer", None),
    ]))
    data2 = _g(spark, _person([("literal", "Ada", None, None)]) + [
        ("iri", EX + "a", EX + "ban", "literal", "yes", None, None),
    ])
    rep = validate(data2, shapes2).collect()
    assert [(r["focus"], r["constraint"]) for r in rep] == [(EX + "a", "not")]
    ok = _g(spark, _person([("literal", "Ada", None, None)]))
    assert conforms(ok, shapes2)


def test_qualified_value_shape(spark):
    """sh:qualifiedValueShape + qualifiedMin/MaxCount: per-focus count
    of values CONFORMING to the inner shape, bound-checked."""
    shapes = _g(spark, _shape_rows([
        ("bnode", "_:p", SH + "qualifiedValueShape", "bnode", "_:qv", None, None),
        ("bnode", "_:p", SH + "qualifiedMinCount", "literal", "1",
         XSD + "integer", None),
        ("bnode", "_:p", SH + "qualifiedMaxCount", "literal", "2",
         XSD + "integer", None),
        ("bnode", "_:qv", SH + "pattern", "literal", "^[A-Z]", None, None),
    ]))
    # one capitalized name among three -> qn=1, conforms
    ok = _g(spark, _person([
        ("literal", "Ada", None, None), ("literal", "ada", None, None),
        ("literal", "lovelace", None, None)]))
    assert conforms(ok, shapes)
    # none capitalized -> qualifiedMinCount
    bad = _g(spark, _person([("literal", "ada", None, None)]))
    rep = validate(bad, shapes).collect()
    assert [(r["constraint"], r["value"]) for r in rep] == [
        ("qualifiedMinCount", "0")]
    # three capitalized -> qualifiedMaxCount
    bad2 = _g(spark, _person([
        ("literal", "A", None, None), ("literal", "B", None, None),
        ("literal", "C", None, None)]))
    rep2 = validate(bad2, shapes).collect()
    assert [(r["constraint"], r["value"]) for r in rep2] == [
        ("qualifiedMaxCount", "3")]
    with pytest.raises(ValueError, match="qualifiedMinCount"):
        validate(bad, _g(spark, _shape_rows([
            ("bnode", "_:p", SH + "qualifiedValueShape", "bnode", "_:qv",
             None, None)])))


def test_qualified_value_shapes_disjoint(spark):
    """sh:qualifiedValueShapesDisjoint: a value node conforming to a
    SIBLING qualified shape is excluded from the conforming count
    (spec 4.5.1; Jena QualifiedValueShape sibling collection)."""
    extra = [
        ("bnode", "_:p", SH + "qualifiedValueShape", "bnode", "_:qa", None, None),
        ("bnode", "_:p", SH + "qualifiedMinCount", "literal", "1",
         XSD + "integer", None),
        ("bnode", "_:p", SH + "qualifiedValueShapesDisjoint", "literal",
         "true", XSD + "boolean", None),
        ("bnode", "_:qa", SH + "pattern", "literal", "^A", None, None),
        # sibling property shape on the same node shape
        ("iri", EX + "PersonShape", SH + "property", "bnode", "_:p2", None, None),
        ("bnode", "_:p2", SH + "path", "iri", EX + "name", None, None),
        ("bnode", "_:p2", SH + "qualifiedValueShape", "bnode", "_:qb", None, None),
        ("bnode", "_:p2", SH + "qualifiedMinCount", "literal", "1",
         XSD + "integer", None),
        ("bnode", "_:p2", SH + "qualifiedValueShapesDisjoint", "literal",
         "true", XSD + "boolean", None),
        ("bnode", "_:qb", SH + "pattern", "literal", "a$", None, None),
    ]
    # a distinct witness per qualified shape plus one both-matching
    # value -> still conforms (the shared value is dropped from both)
    ok = _person([("literal", "Ax", None, None), ("literal", "ba", None, None),
                  ("literal", "Aa", None, None)])
    assert viol(spark, ok, extra) == set()
    # ONLY the both-matching value: disjointness removes it from BOTH
    # counts -> two qualifiedMinCount violations (without the flag this
    # data conforms — that's the discriminating case)
    bad = _person([("literal", "Aa", None, None)])
    # both sibling shapes violate; the rows collapse to one because the
    # report keys on (shape, path, constraint, value) and both property
    # shapes share ex:name
    assert viol(spark, bad, extra) == {("qualifiedMinCount", "0")}
    # flag off (explicit false): the shared value counts for both
    no_flag = [r for r in extra if r[2] != SH + "qualifiedValueShapesDisjoint"]
    assert viol(spark, bad, no_flag) == set()


def test_language_in(spark):
    """sh:languageIn (StrLanguageIn): lang tag must match a basic
    language range — case-insensitive, range-prefix semantics."""
    rdf = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    shapes = _g(spark, _shape_rows([
        ("bnode", "_:p", SH + "languageIn", "bnode", "_:l1", None, None),
        ("bnode", "_:l1", rdf + "first", "literal", "en", None, None),
        ("bnode", "_:l1", rdf + "rest", "bnode", "_:l2", None, None),
        ("bnode", "_:l2", rdf + "first", "literal", "fr", None, None),
        ("bnode", "_:l2", rdf + "rest", "iri", rdf + "nil", None, None),
    ]))
    ok = _g(spark, _person([
        ("literal", "hello", None, "en"),
        ("literal", "hi", None, "EN-GB"),      # range prefix, case-insensitive
        ("literal", "salut", None, "fr"),
    ]))
    assert conforms(ok, shapes)
    rep = validate(_g(spark, _person([
        ("literal", "hallo", None, "de"),
        ("literal", "plain", None, None),       # untagged violates
    ])), shapes).collect()
    assert {r["value"] for r in rep} == {"hallo", "plain"}


def test_empty_combinator_lists_and_case_insensitive_uniquelang(spark):
    """Empty sh:and conforms vacuously; empty sh:or/xone can never be
    satisfied; uniqueLang compares tags case-insensitively."""
    RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    data = _g(spark, _person([("literal", "Ada", None, None)]))
    empty_and = _g(spark, _shape_rows([
        ("bnode", "_:p", SH + "and", "iri", RDF + "nil", None, None)]))
    assert conforms(data, empty_and)
    empty_or = _g(spark, _shape_rows([
        ("bnode", "_:p", SH + "or", "iri", RDF + "nil", None, None)]))
    assert not conforms(data, empty_or)
    ul = _g(spark, _shape_rows([
        ("bnode", "_:p", SH + "uniqueLang", "literal", "true",
         XSD + "boolean", None)]))
    mixed = _g(spark, _person([
        ("literal", "hello", None, "en"), ("literal", "Hallo", None, "EN")]))
    rep = validate(mixed, ul).collect()
    assert [(r["constraint"], r["value"]) for r in rep] == [("uniqueLang", "en")]


RDFNS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"


def _list_rows(subj, head, members):
    """Shape-graph rows forming an RDF list of IRI members at `head`
    (each member may also be ('bnode', label))."""
    rows = []
    node = head
    for i, m in enumerate(members):
        nxt = (f"{head}_{i+1}" if i + 1 < len(members) else None)
        rows.append(("bnode", node, RDFNS + "first", m[0], m[1], None, None))
        if nxt is None:
            rows.append(("bnode", node, RDFNS + "rest",
                         "iri", RDFNS + "nil", None, None))
        else:
            rows.append(("bnode", node, RDFNS + "rest",
                         "bnode", nxt, None, None))
        node = nxt
    return rows


def _path_shape(spark, path_rows, extra=()):
    """NodeShape targeting ex:Person whose one property shape carries
    the path described by `path_rows` (on bnode _:pp) plus `extra`
    constraint rows on the property shape bnode _:p."""
    rows = [
        ("iri", EX + "S", SH + "targetClass", "iri", EX + "Person",
         None, None),
        ("iri", EX + "S", SH + "property", "bnode", "_:p", None, None),
    ] + list(path_rows) + list(extra)
    return _g(spark, rows)


def test_sequence_path(spark):
    """sh:path (ex:knows ex:name): value nodes are names of knowees;
    minCount flags persons whose knowees have no name. Report path is
    the SPARQL sequence syntax."""
    shapes = _path_shape(
        spark,
        [("bnode", "_:p", SH + "path", "bnode", "_:pp", None, None)]
        + _list_rows("S", "_:pp", [("iri", EX + "knows"),
                                   ("iri", EX + "name")]),
        [("bnode", "_:p", SH + "minCount", "literal", "1",
          XSD + "integer", None)])
    data = _g(spark, [
        ("iri", EX + "a", RDF_TYPE, "iri", EX + "Person", None, None),
        ("iri", EX + "a", EX + "knows", "iri", EX + "b", None, None),
        ("iri", EX + "b", EX + "name", "literal", "Bea", None, None),
        ("iri", EX + "c", RDF_TYPE, "iri", EX + "Person", None, None),
        ("iri", EX + "c", EX + "knows", "iri", EX + "d", None, None),
    ])
    rep = validate(data, shapes).collect()
    assert [(r["focus"], r["constraint"], r["path"]) for r in rep] == [
        (EX + "c", "minCount", f"{EX}knows/{EX}name")]


def test_alternative_path(spark):
    """sh:path [sh:alternativePath (ex:nick ex:name)]: values from
    either predicate; datatype constraint catches the typed nick."""
    shapes = _path_shape(
        spark,
        [("bnode", "_:p", SH + "path", "bnode", "_:pp", None, None),
         ("bnode", "_:pp", SH + "alternativePath", "bnode", "_:alt",
          None, None)]
        + _list_rows("S", "_:alt", [("iri", EX + "nick"),
                                    ("iri", EX + "name")]),
        [("bnode", "_:p", SH + "datatype", "iri", XSD + "string",
          None, None)])
    data = _g(spark, [
        ("iri", EX + "a", RDF_TYPE, "iri", EX + "Person", None, None),
        ("iri", EX + "a", EX + "name", "literal", "Ada", None, None),
        ("iri", EX + "a", EX + "nick", "literal", "7",
         XSD + "integer", None),
    ])
    rep = validate(data, shapes).collect()
    assert [(r["constraint"], r["value"]) for r in rep] == [("value", "7")]


def test_zero_or_more_path(spark):
    """sh:path [sh:zeroOrMorePath ex:boss]: value nodes are the boss
    closure INCLUDING the focus itself; maxCount 2 flags the chain
    bottom; a boss cycle terminates."""
    shapes = _path_shape(
        spark,
        [("bnode", "_:p", SH + "path", "bnode", "_:pp", None, None),
         ("bnode", "_:pp", SH + "zeroOrMorePath", "iri", EX + "boss",
          None, None)],
        [("bnode", "_:p", SH + "maxCount", "literal", "2",
          XSD + "integer", None)])
    data = _g(spark, [
        ("iri", EX + "a", RDF_TYPE, "iri", EX + "Person", None, None),
        ("iri", EX + "c", RDF_TYPE, "iri", EX + "Person", None, None),
        ("iri", EX + "a", EX + "boss", "iri", EX + "b", None, None),
        ("iri", EX + "b", EX + "boss", "iri", EX + "c", None, None),
    ])
    rep = validate(data, shapes).collect()
    # a's values = {a, b, c} (3 > 2); c's = {c} alone
    assert [(r["focus"], r["constraint"], r["value"]) for r in rep] == [
        (EX + "a", "maxCount", "3")]
    # cycle: closure terminates, every node reaches both
    cyc = _g(spark, [
        ("iri", EX + "a", RDF_TYPE, "iri", EX + "Person", None, None),
        ("iri", EX + "a", EX + "boss", "iri", EX + "b", None, None),
        ("iri", EX + "b", EX + "boss", "iri", EX + "a", None, None),
    ])
    assert conforms(cyc, shapes)  # a's values = {a, b} (2 <= 2)


def test_one_or_more_and_zero_or_one_path(spark):
    """oneOrMorePath excludes the focus (minCount 1 flags leaf-less),
    zeroOrOnePath = focus plus one step."""
    plus = _path_shape(
        spark,
        [("bnode", "_:p", SH + "path", "bnode", "_:pp", None, None),
         ("bnode", "_:pp", SH + "oneOrMorePath", "iri", EX + "boss",
          None, None)],
        [("bnode", "_:p", SH + "minCount", "literal", "1",
          XSD + "integer", None)])
    data = _g(spark, [
        ("iri", EX + "a", RDF_TYPE, "iri", EX + "Person", None, None),
        ("iri", EX + "c", RDF_TYPE, "iri", EX + "Person", None, None),
        ("iri", EX + "a", EX + "boss", "iri", EX + "b", None, None),
        ("iri", EX + "b", EX + "boss", "iri", EX + "c", None, None),
    ])
    rep = validate(data, plus).collect()
    assert [(r["focus"], r["constraint"]) for r in rep] == [
        (EX + "c", "minCount")]  # c has no boss+ values; a has {b,c}
    opt = _path_shape(
        spark,
        [("bnode", "_:p", SH + "path", "bnode", "_:pp", None, None),
         ("bnode", "_:pp", SH + "zeroOrOnePath", "iri", EX + "boss",
          None, None)],
        [("bnode", "_:p", SH + "minCount", "literal", "2",
          XSD + "integer", None)])
    rep = validate(data, opt).collect()
    # a's values = {a, b} (2, ok); c's = {c} (1 < 2)
    assert [(r["focus"], r["constraint"], r["value"]) for r in rep] == [
        (EX + "c", "minCount", "1")]


def test_inverse_sequence_path(spark):
    """sh:path [sh:inversePath (ex:knows ex:name)]: focus literals
    (targeted by name value) map back to the knowers."""
    shapes = _g(spark, [
        ("iri", EX + "S", SH + "targetObjectsOf", "iri", EX + "name",
         None, None),
        ("iri", EX + "S", SH + "property", "bnode", "_:p", None, None),
        ("bnode", "_:p", SH + "path", "bnode", "_:pp", None, None),
        ("bnode", "_:pp", SH + "inversePath", "bnode", "_:seq",
         None, None),
    ] + _list_rows("S", "_:seq", [("iri", EX + "knows"),
                                  ("iri", EX + "name")]) + [
        ("bnode", "_:p", SH + "minCount", "literal", "1",
         XSD + "integer", None),
    ])
    data = _g(spark, [
        ("iri", EX + "a", EX + "knows", "iri", EX + "b", None, None),
        ("iri", EX + "b", EX + "name", "literal", "Bea", None, None),
        ("iri", EX + "x", EX + "name", "literal", "Xan", None, None),
    ])
    rep = validate(data, shapes).collect()
    # "Bea" is reached by a via knows/name -> has an inverse value;
    # "Xan" has no knower -> minCount violation
    assert [(r["focus"], r["constraint"]) for r in rep] == [
        ("Xan", "minCount")]
    assert rep[0]["path"] == f"^({EX}knows/{EX}name)"


def test_path_inside_inner_shape(spark):
    """A sequence path inside a sh:node inner shape exercises the
    set-based conformance-flag machinery (_conform_flags)."""
    shapes = _g(spark, [
        ("iri", EX + "S", SH + "targetClass", "iri", EX + "Person",
         None, None),
        ("iri", EX + "S", SH + "property", "bnode", "_:p", None, None),
        ("bnode", "_:p", SH + "path", "iri", EX + "knows", None, None),
        ("bnode", "_:p", SH + "node", "bnode", "_:inner", None, None),
        ("iri", EX + "_innerdecl", SH + "targetNode", "iri",
         EX + "unused", None, None),
        ("bnode", "_:inner", SH + "property", "bnode", "_:ip",
         None, None),
        ("bnode", "_:ip", SH + "path", "bnode", "_:ipp", None, None),
        ("bnode", "_:ip", SH + "minCount", "literal", "1",
         XSD + "integer", None),
    ] + _list_rows("S", "_:ipp", [("iri", EX + "employer"),
                                  ("iri", EX + "name")]))
    data = _g(spark, [
        ("iri", EX + "a", RDF_TYPE, "iri", EX + "Person", None, None),
        ("iri", EX + "a", EX + "knows", "iri", EX + "b", None, None),
        ("iri", EX + "b", EX + "employer", "iri", EX + "co", None, None),
        ("iri", EX + "co", EX + "name", "literal", "ACME", None, None),
        ("iri", EX + "z", RDF_TYPE, "iri", EX + "Person", None, None),
        ("iri", EX + "z", EX + "knows", "iri", EX + "q", None, None),
        ("iri", EX + "q", EX + "employer", "iri", EX + "shell",
         None, None),
    ])
    rep = validate(data, shapes).collect()
    # b's employer has a name -> conforms; q's employer has none ->
    # z's value q fails the inner shape
    zrows = [(r["focus"], r["constraint"], r["value"]) for r in rep
             if r["focus"] == EX + "z"]
    assert zrows == [(EX + "z", "node", EX + "q")]


def test_deactivated(spark):
    """sh:deactivated true: the shape validates nothing — property
    level, node level, and the all-deactivated graph (empty report)."""
    data = _g(spark, _person([]))  # person with no name at all
    active = _g(spark, _shape_rows([
        ("bnode", "_:p", SH + "minCount", "literal", "1",
         XSD + "integer", None)]))
    assert not conforms(data, active)
    deact_prop = _g(spark, _shape_rows([
        ("bnode", "_:p", SH + "minCount", "literal", "1",
         XSD + "integer", None),
        ("bnode", "_:p", SH + "deactivated", "literal", "true",
         XSD + "boolean", None)]))
    assert conforms(data, deact_prop)
    deact_node = _g(spark, _shape_rows([
        ("bnode", "_:p", SH + "minCount", "literal", "1",
         XSD + "integer", None),
        ("iri", EX + "PersonShape", SH + "deactivated", "literal", "true",
         XSD + "boolean", None)]))
    rep = validate(data, deact_node)
    assert rep.isEmpty() and rep.columns == [
        "shape", "focus_kind", "focus", "path", "constraint", "value",
        "severity", "message"]


def test_severity_and_message(spark):
    """sh:severity / sh:message surface as resultSeverity /
    resultMessage; defaults are sh:Violation and NULL."""
    data = _g(spark, _person([]))  # no name
    shapes = _g(spark, _shape_rows([
        ("bnode", "_:p", SH + "minCount", "literal", "1",
         XSD + "integer", None),
        ("bnode", "_:p", SH + "severity", "iri", SH + "Warning",
         None, None),
        ("bnode", "_:p", SH + "message", "literal", "name required",
         None, None)]))
    rep = validate(data, shapes).collect()
    assert [(r["severity"], r["message"]) for r in rep] == [
        (SH + "Warning", "name required")]
    default = _g(spark, _shape_rows([
        ("bnode", "_:p", SH + "minCount", "literal", "1",
         XSD + "integer", None)]))
    rep = validate(data, default).collect()
    assert [(r["severity"], r["message"]) for r in rep] == [
        (SH + "Violation", None)]


def test_literal_focus_zero_path_keeps_datatype(spark):
    """ADVICE r3 regression: a literal focus node (via
    sh:targetObjectsOf) under sh:zeroOrMorePath is re-injected as its
    own value node WITH its datatype/lang — "5"^^xsd:integer must not
    judge as xsd:string, and a lang-tagged focus must satisfy
    sh:languageIn."""
    # focus = objects of ex:score; zero-path identity; sh:datatype int
    shapes = _g(spark, [
        ("iri", EX + "S", SH + "targetObjectsOf", "iri", EX + "score",
         None, None),
        ("iri", EX + "S", SH + "property", "bnode", "_:p", None, None),
        ("bnode", "_:p", SH + "path", "bnode", "_:pp", None, None),
        ("bnode", "_:pp", SH + "zeroOrMorePath", "iri", EX + "next",
         None, None),
        ("bnode", "_:p", SH + "datatype", "iri", XSD + "integer",
         None, None),
    ])
    ok = _g(spark, [
        ("iri", EX + "a", EX + "score", "literal", "5",
         XSD + "integer", None)])
    assert conforms(ok, shapes)  # typed focus keeps xsd:integer
    bad = _g(spark, [
        ("iri", EX + "a", EX + "score", "literal", "5", None, None)])
    rep = validate(bad, shapes).collect()  # plain focus IS xsd:string
    assert [(r["constraint"], r["value"]) for r in rep] == [("value", "5")]

    # node-level constraint on a lang-tagged literal focus: languageIn
    lang_shapes = _g(spark, [
        ("iri", EX + "L", SH + "targetObjectsOf", "iri", EX + "label",
         None, None),
        ("iri", EX + "L", SH + "languageIn", "bnode", "_:l0", None, None),
        ("bnode", "_:l0", "http://www.w3.org/1999/02/22-rdf-syntax-ns#first",
         "literal", "en", None, None),
        ("bnode", "_:l0", "http://www.w3.org/1999/02/22-rdf-syntax-ns#rest",
         "iri", "http://www.w3.org/1999/02/22-rdf-syntax-ns#nil",
         None, None),
    ])
    ok_lang = _g(spark, [
        ("iri", EX + "a", EX + "label", "literal", "hi", None, "en")])
    assert conforms(ok_lang, lang_shapes)
    bad_lang = _g(spark, [
        ("iri", EX + "a", EX + "label", "literal", "salut", None, "fr")])
    assert not conforms(bad_lang, lang_shapes)


def test_deep_chain_path_closure(spark):
    """ADVICE r3 regression: path-doubling closure completes on a
    chain deeper than the old 30-round semi-naive ceiling (40-link
    boss chain; doubling needs ~6 rounds)."""
    n = 40
    chain = [("iri", EX + "n0", RDF_TYPE, "iri", EX + "Person",
              None, None)] + [
        ("iri", EX + f"n{i}", EX + "boss", "iri", EX + f"n{i+1}",
         None, None) for i in range(n)]
    shapes = _path_shape(
        spark,
        [("bnode", "_:p", SH + "path", "bnode", "_:pp", None, None),
         ("bnode", "_:pp", SH + "oneOrMorePath", "iri", EX + "boss",
          None, None)],
        [("bnode", "_:p", SH + "maxCount", "literal", str(n - 1),
          XSD + "integer", None)])
    rep = validate(_g(spark, chain), shapes).collect()
    # n0 reaches all 40 downstream nodes -> maxCount(39) violated by 40
    assert [(r["focus"], r["constraint"], r["value"]) for r in rep] == [
        (EX + "n0", "maxCount", str(n))]
