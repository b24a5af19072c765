"""GenericRuleReasoner analog: parser + forward-engine tests.

Reference: ``jena-core/.../reasoner/rulesys/Rule.java`` (embedded rule
grammar), ``FRuleEngine.java`` (forward fixpoint),
``rulesys/builtins/`` (builtin semantics); Jena's own tests at
``jena-core/src/test/java/org/apache/jena/reasoner/rulesys/test/
TestBasics.java`` (rule parsing) and ``TestFBRules.java`` (forward
rule firing) are the model for the cases here.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from jena_spark import terms as TM
from jena_spark.pipeline.rules import (
    BuiltinCall,
    ParsedRule,
    parse_rules,
    rule_closure,
)
from jena_spark.queries.algebra import Var

V = "http://ex/v#"
XSD = "http://www.w3.org/2001/XMLSchema#"

TERM_SCHEMA = (
    "s_kind string, s_val string, p_val string, o_kind string, "
    "o_val string, o_datatype string, o_lang string"
)


def _g(spark, rows):
    return spark.createDataFrame(rows, TERM_SCHEMA)


def _rows(df, pred):
    return sorted(
        (r["s_val"], r["o_val"], r["o_datatype"], r["o_kind"])
        for r in df.where(F.col("p_val") == pred).collect()
    )


# --- parser ------------------------------------------------------------------

def test_parse_basic_rule():
    rs = parse_rules(
        "@prefix v: <http://ex/v#>.\n"
        "[r1: (?a v:p ?b), (?b v:p ?c) -> (?a v:q ?c)]"
    )
    assert len(rs) == 1
    r = rs[0]
    assert r.name == "r1"
    assert r.body_patterns == [
        (Var("a"), ("iri", V + "p", None, None), Var("b")),
        (Var("b"), ("iri", V + "p", None, None), Var("c")),
    ]
    assert r.head_patterns == [(Var("a"), ("iri", V + "q", None, None), Var("c"))]


def test_parse_terms():
    (r,) = parse_rules(
        "[t: (?x <http://ex/p> 42), (?x rdf:type ?c), "
        "ge(?x, 3.5), equal(?y, 'lit'^^xsd:int), equal(?z, 'plain') -> "
        "(?x <http://ex/q> 'out')]"
    )
    assert r.body_patterns[0][2] == ("literal", "42", XSD + "int", None)
    assert r.body_patterns[1][1] == ("iri", TM.RDF_TYPE, None, None)
    ge, eq1, eq2 = r.body_builtins
    assert ge == BuiltinCall("ge", (Var("x"), ("literal", "3.5", XSD + "float", None)))
    assert eq1.args[1] == ("literal", "lit", XSD + "int", None)
    assert eq2.args[1] == ("literal", "plain", None, None)


def test_parse_anonymous_rule_and_comments():
    rs = parse_rules(
        "# a comment line\n"
        "[(?a <http://ex/p> ?b) -> (?b <http://ex/p> ?a)]  # trailing\n"
    )
    assert rs[0].name is None and len(rs[0].body_patterns) == 1


@pytest.mark.parametrize(
    "text,msg",
    [
        ("[r: (?a <http://e/p> ?b) -> [(?a <http://e/q> ?b) -> (?a <http://e/r> ?b)]]",
         "nested"),
        ("@include <owlmicro>.\n[r: (?a <http://e/p> ?b) -> (?a <http://e/q> ?b)]",
         "not supported"),
        ("[r: (?a unknown:p ?b) -> (?a <http://e/q> ?b)]", "prefix"),
        ("[r: (?a <http://e/p> *) -> (?a <http://e/q> ?a)]", "wildcard"),
        ("[r: (?a <http://e/q> ?a) -> ]", "empty"),
    ],
)
def test_parse_errors(text, msg):
    with pytest.raises(ValueError, match=msg):
        parse_rules(text)


def test_unsupported_builtins_raise(spark):
    g = _g(spark, [("iri", "a", V + "p", "iri", "b", None, None)])
    for b in ("makeTemp(?x)", "now(?x)", "print(?a)"):
        with pytest.raises(ValueError, match="not supported"):
            rule_closure(g, f"[r: (?a <{V}p> ?b), {b} -> (?a <{V}q> ?b)]").count()
    with pytest.raises(ValueError, match="unknown builtin"):
        rule_closure(g, f"[r: (?a <{V}p> ?b), frobnicate(?a) -> (?a <{V}q> ?b)]").count()


# --- guard builtins ----------------------------------------------------------

def test_numeric_guards(spark):
    g = _g(spark, [
        ("iri", "a", V + "score", "literal", "3", XSD + "int", None),
        ("iri", "b", V + "score", "literal", "10", XSD + "int", None),
        ("iri", "c", V + "score", "literal", "oops", None, None),
    ])
    out = rule_closure(g, f"[r: (?x <{V}score> ?s), greaterThan(?s, 5) -> (?x <{V}big> ?s)]")
    assert _rows(out, V + "big") == [("b", "10", XSD + "int", "literal")]
    # numeric compare is by VALUE not lexical form ("10" > "5" numerically,
    # lexically it sorts first); non-numeric literals never fire
    out = rule_closure(g, f"[r: (?x <{V}score> ?s), lessThan(?s, 5) -> (?x <{V}small> ?s)]")
    assert _rows(out, V + "small") == [("a", "3", XSD + "int", "literal")]


def test_equal_same_value_semantics(spark):
    # Equal.java uses sameValueAs: "01"^^int equals "1"^^int by value
    g = _g(spark, [
        ("iri", "a", V + "n", "literal", "01", XSD + "int", None),
        ("iri", "b", V + "n", "literal", "1", XSD + "int", None),
        ("iri", "c", V + "n", "literal", "2", XSD + "int", None),
    ])
    out = rule_closure(
        g, f"[r: (?x <{V}n> ?i), (?y <{V}n> ?j), notEqual(?x, ?y), equal(?i, ?j) "
           f"-> (?x <{V}sameN> ?y)]")
    assert _rows(out, V + "sameN") == [("a", "b", None, "iri"), ("b", "a", None, "iri")]


def test_kind_guards_and_novalue(spark):
    g = _g(spark, [
        ("iri", "a", V + "p", "literal", "x", None, None),
        ("iri", "b", V + "p", "bnode", "bn1", None, None),
        ("iri", "a", V + "done", "literal", "y", None, None),
    ])
    out = rule_closure(g, f"[r: (?s <{V}p> ?o), isLiteral(?o) -> (?s <{V}lit> ?o)]")
    assert _rows(out, V + "lit") == [("a", "x", None, "literal")]
    out = rule_closure(g, f"[r: (?s <{V}p> ?o), isBNode(?o) -> (?s <{V}bn> ?o)]")
    assert _rows(out, V + "bn") == [("b", "bn1", None, "bnode")]
    # noValue(s, p): fires only where no (s, done, *) triple exists
    out = rule_closure(
        g, f"[r: (?s <{V}p> ?o), noValue(?s, <{V}done>) -> (?s <{V}todo> ?o)]")
    assert _rows(out, V + "todo") == [("b", "bn1", None, "bnode")]


def test_isdtype(spark):
    g = _g(spark, [
        ("iri", "a", V + "p", "literal", "5", XSD + "int", None),
        ("iri", "b", V + "p", "literal", "x", None, None),
    ])
    out = rule_closure(
        g, f"[r: (?s <{V}p> ?o), isDType(?o, xsd:int) -> (?s <{V}typed> ?o)]")
    assert _rows(out, V + "typed") == [("a", "5", XSD + "int", "literal")]


def test_regex_filter_and_group_binding(spark):
    g = _g(spark, [
        ("iri", "a", V + "mail", "literal", "ann@ex.org", None, None),
        ("iri", "b", V + "mail", "literal", "not-an-email", None, None),
    ])
    # Regex.java: full-region match; trailing args bind capture groups
    out = rule_closure(
        g, f"[r: (?s <{V}mail> ?m), regex(?m, '(\\\\w+)@(\\\\S+)', ?user, ?host) "
           f"-> (?s <{V}user> ?user), (?s <{V}host> ?host)]")
    assert _rows(out, V + "user") == [("a", "ann", None, "literal")]
    assert _rows(out, V + "host") == [("a", "ex.org", None, "literal")]


# --- binder builtins ---------------------------------------------------------

def test_arithmetic_binders(spark):
    g = _g(spark, [
        ("iri", "a", V + "x", "literal", "3", XSD + "int", None),
        ("iri", "a", V + "y", "literal", "4", XSD + "int", None),
        ("iri", "b", V + "x", "literal", "1.5", XSD + "double", None),
        ("iri", "b", V + "y", "literal", "2", XSD + "int", None),
    ])
    out = rule_closure(
        g, f"[r: (?s <{V}x> ?x), (?s <{V}y> ?y), sum(?x, ?y, ?z) -> (?s <{V}sum> ?z)]")
    # int+int stays int (Util.makeIntNode), mixed promotes to double
    assert _rows(out, V + "sum") == [
        ("a", "7", XSD + "int", "literal"), ("b", "3.5", XSD + "double", "literal")]
    out = rule_closure(
        g, f"[r: (?s <{V}x> ?x), addOne(?x, ?z) -> (?s <{V}next> ?z)]")
    assert ("a", "4", XSD + "int", "literal") in _rows(out, V + "next")


def test_count_literal_values(spark):
    # CountLiteralValues.java: distinct literal values of (s, p);
    # IRI objects don't count; absent -> 0
    g = _g(spark, [
        ("iri", "a", V + "tag", "literal", "x", None, None),
        ("iri", "a", V + "tag", "literal", "y", None, None),
        ("iri", "a", V + "tag", "literal", "x", XSD + "int", None),  # distinct by dt
        ("iri", "b", V + "tag", "iri", "not-a-literal", None, None),
        ("iri", "a", V + "seen", "literal", "1", None, None),
        ("iri", "b", V + "seen", "literal", "1", None, None),
    ])
    out = rule_closure(
        g, f"[r: (?s <{V}seen> ?x), countLiteralValues(?c, ?s, <{V}tag>) "
           f"-> (?s <{V}tagCount> ?c)]")
    assert _rows(out, V + "tagCount") == [
        ("a", "3", XSD + "int", "literal"), ("b", "0", XSD + "int", "literal")]


def test_concat_and_skolem_binders(spark):
    g = _g(spark, [("iri", "http://e/a", V + "p", "literal", "x", None, None)])
    out = rule_closure(
        g, f"[r: (?s <{V}p> ?o), strConcat(?s, '-', ?o, ?l), "
           f"uriConcat(?s, '#frag', ?u), makeSkolem(?sk, ?s, ?o) -> "
           f"(?s <{V}lab> ?l), (?s <{V}uri> ?u), (?s <{V}sk> ?sk)]")
    assert _rows(out, V + "lab") == [("http://e/a", "http://e/a-x", None, "literal")]
    assert _rows(out, V + "uri") == [("http://e/a", "http://e/a#frag", None, "iri")]
    (sk_row,) = _rows(out, V + "sk")
    assert sk_row[3] == "bnode" and sk_row[1].startswith("skolem-")
    # deterministic: same inputs, same skolem id
    out2 = rule_closure(
        g, f"[r: (?s <{V}p> ?o), makeSkolem(?sk, ?s, ?o) -> (?s <{V}sk> ?sk)]")
    assert _rows(out2, V + "sk") == [sk_row]


# --- the fixpoint ------------------------------------------------------------

def _py_closure(edges: set[tuple[str, str]]) -> set[tuple[str, str]]:
    out = set(edges)
    while True:
        new = {(a, d) for a, b in out for c, d in edges if b == c} - out
        if not new:
            return out
        out |= new


def test_transitive_fixpoint_matches_python(spark):
    import random

    rnd = random.Random(7)
    nodes = [f"n{i}" for i in range(12)]
    edges = {
        (rnd.choice(nodes), rnd.choice(nodes)) for _ in range(18)
    }
    g = _g(spark, [("iri", a, V + "p", "iri", b, None, None) for a, b in edges])
    out = rule_closure(
        g, f"[t: (?a <{V}p> ?b), (?b <{V}p> ?c) -> (?a <{V}p> ?c)]")
    got = {(s, o) for s, o, _dt, _k in _rows(out, V + "p")}
    assert got == _py_closure(edges)


def test_multi_rule_stratified_interaction(spark):
    # rule 2 consumes rule 1's output across rounds (semi-naive delta)
    g = _g(spark, [
        ("iri", "a", V + "p", "iri", "b", None, None),
        ("iri", "b", V + "p", "iri", "c", None, None),
    ])
    out = rule_closure(g, (
        f"[r1: (?x <{V}p> ?y) -> (?x <{V}q> ?y)]\n"
        f"[r2: (?x <{V}q> ?y), (?y <{V}q> ?z) -> (?x <{V}q> ?z)]\n"
        f"[r3: (?x <{V}q> ?z), noValue(?x, <{V}p>, ?z) -> (?x <{V}derived> ?z)]"
    ))
    assert {(s, o) for s, o, _d, _k in _rows(out, V + "q")} == {
        ("a", "b"), ("b", "c"), ("a", "c")}
    # noValue sees the graph state at fire time: only (a,c) lacks a p-edge
    assert _rows(out, V + "derived") == [("a", "c", None, "iri")]


def test_base_triples_preserved_and_set_semantics(spark):
    g = _g(spark, [
        ("iri", "a", V + "p", "iri", "b", None, None),
        ("iri", "a", V + "q", "iri", "b", None, None),  # head already asserted
    ])
    out = rule_closure(g, f"[r: (?x <{V}p> ?y) -> (?x <{V}q> ?y)]")
    assert out.count() == 2  # no duplicate (a,q,b)


def test_rule_plan_shape(spark):
    """Scale-posture regression: a rule firing is equi joins + filters —
    no nested-loop join, no Python evaluation on the data path."""
    g = _g(spark, [
        ("iri", "d", V + "mentions", "iri", "A", None, None),
        ("iri", "d", V + "mentions", "iri", "B", None, None),
    ])
    out = rule_closure(
        g, f"[r: (?d <{V}mentions> ?a), (?d <{V}mentions> ?b), "
           f"notEqual(?a, ?b), strConcat(?a, ?b, ?l) -> (?a <{V}lab> ?l)]")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan  # no row-at-a-time or Arrow Python


def test_nonconvergent_rule_raises(spark):
    g = _g(spark, [("iri", "a", V + "p", "literal", "x", None, None)])
    with pytest.raises(ValueError, match="converge"):
        # value-generating recursion: every round mints a longer string
        rule_closure(
            g, f"[r: (?a <{V}p> ?b), strConcat(?b, 'x', ?c) -> (?a <{V}p> ?c)]",
            max_iter=4,
        )


def test_include_owl_library(spark):
    """@include <owl> (OWLFBRuleReasoner core) composes with user rules;
    inverse entailments of TRANSITIVELY-derived edges are reached (the
    fixpoint interaction the dedicated reasoner needed a fix for)."""
    OWL = "http://www.w3.org/2002/07/owl#"
    g = _g(spark, [
        ("iri", V + "anc", OWL + "inverseOf", "iri", V + "desc", None, None),
        ("iri", V + "anc", TM.RDF_TYPE, "iri", OWL + "TransitiveProperty", None, None),
        ("iri", "x", V + "anc", "iri", "y", None, None),
        ("iri", "y", V + "anc", "iri", "z", None, None),
    ])
    out = rule_closure(g, "@include <owl>.\n"
                          f"[user: (?a <{V}desc> ?b) -> (?a <{V}below> ?b)]")
    assert ("x", "z", None, "iri") in _rows(out, V + "anc")   # transitive
    assert ("z", "x", None, "iri") in _rows(out, V + "desc")  # inverse of derived
    assert ("z", "x", None, "iri") in _rows(out, V + "below")  # user rule composes


def test_backward_rules_parse_and_forward_engine_rejects(spark):
    (r,) = parse_rules(f"[r: (?a <{V}anc> ?b) <- (?a <{V}parent> ?b)]")
    assert r.is_backward
    assert r.head_patterns == [(Var("a"), ("iri", V + "anc", None, None), Var("b"))]
    assert r.body_patterns == [(Var("a"), ("iri", V + "parent", None, None), Var("b"))]
    g = _g(spark, [("iri", "a", V + "parent", "iri", "b", None, None)])
    with pytest.raises(ValueError, match="backward"):
        rule_closure(g, [r]).count()


def test_backward_query_transitive():
    # static goal-directed restriction: only rules reaching the goal
    # predicate enter the fixpoint (LPRuleStore head indexing)
    from jena_spark.pipeline.rules import relevant_rules

    rules = parse_rules(
        f"[anc1: (?a <{V}anc> ?b) <- (?a <{V}parent> ?b)]\n"
        f"[ancT: (?a <{V}anc> ?c) <- (?a <{V}parent> ?b), (?b <{V}anc> ?c)]\n"
        f"[noise: (?x <{V}noisy> ?y) <- (?x <{V}other> ?y)]"
    )
    rel = relevant_rules(
        [type(r)(r.name, r.body_patterns, r.body_builtins, r.head_patterns)
         for r in rules],
        V + "anc")
    assert {r.name for r in rel} == {"anc1", "ancT"}


def test_backward_query_answers(spark):
    from jena_spark.pipeline.rules import backward_query

    g = _g(spark, [
        ("iri", "a", V + "parent", "iri", "b", None, None),
        ("iri", "b", V + "parent", "iri", "c", None, None),
        ("iri", "c", V + "parent", "iri", "d", None, None),
        ("iri", "x", V + "other", "iri", "y", None, None),
    ])
    rules = (
        f"[anc1: (?a <{V}anc> ?b) <- (?a <{V}parent> ?b)]\n"
        f"[ancT: (?a <{V}anc> ?c) <- (?a <{V}parent> ?b), (?b <{V}anc> ?c)]\n"
        f"[noise: (?x <{V}noisy> ?y) <- (?x <{V}other> ?y)]"
    )
    out = backward_query(
        g, rules, (Var("who"), ("iri", V + "anc", None, None), Var("of")))
    got = {(r["who"]["val"], r["of"]["val"]) for r in out.collect()}
    assert got == {("a", "b"), ("a", "c"), ("a", "d"),
                   ("b", "c"), ("b", "d"), ("c", "d")}
    # bound-subject goal
    out = backward_query(
        g, rules, (("iri", "b", None, None), ("iri", V + "anc", None, None),
                   Var("of")))
    assert {r["of"]["val"] for r in out.collect()} == {"c", "d"}


def test_backward_query_base_predicate_goal(spark):
    """A goal over a base-data predicate no rule head produces answers
    from the base graph (the LP engine resolves base facts directly);
    the plain-string IRI shorthand works in the goal pattern."""
    from jena_spark.pipeline.rules import backward_query

    g = _g(spark, [("iri", "a", V + "parent", "iri", "b", None, None)])
    rules = f"[anc1: (?a <{V}anc> ?b) <- (?a <{V}parent> ?b)]"
    out = backward_query(g, rules, (Var("x"), V + "parent", Var("y")))
    assert [(r["x"]["val"], r["y"]["val"]) for r in out.collect()] == [("a", "b")]
    # string-shorthand goal over a DERIVED predicate restricts correctly
    out = backward_query(g, rules, (Var("x"), V + "anc", Var("y")))
    assert [(r["x"]["val"], r["y"]["val"]) for r in out.collect()] == [("a", "b")]


def test_count_literal_values_sees_derived(spark):
    """Graph-reading binder builtins re-fire naively every round: the
    count must include triples derived in EARLIER rounds (the naive
    FRuleEngine behavior; plain semi-naive would freeze the round-0
    count)."""
    g = _g(spark, [("iri", "s", V + "base", "iri", "o", None, None)])
    out = rule_closure(g, (
        f"[r1: (?s <{V}base> ?o) -> (?s <{V}tag> 'x')]\n"
        f"[r2: (?s <{V}base> ?o), countLiteralValues(?c, ?s, <{V}tag>) "
        f"-> (?s <{V}n> ?c)]"
    ))
    counts = {r[1] for r in _rows(out, V + "n")}
    assert "1" in counts  # the post-derivation count is reached


def test_arithmetic_nonnumeric_does_not_fire(spark):
    g = _g(spark, [
        ("iri", "a", V + "x", "literal", "oops", None, None),
        ("iri", "b", V + "x", "literal", "2", XSD + "int", None),
    ])
    out = rule_closure(
        g, f"[r: (?s <{V}x> ?x), sum(?x, ?x, ?z) -> (?s <{V}d> ?z)]")
    # Sum.java refuses to fire on non-numerics: no NULL-valued triple
    assert _rows(out, V + "d") == [("b", "4", XSD + "int", "literal")]


def test_axiom_rule(spark):
    # "-> (a p b)" axioms fire unconditionally (Rule.java axiom form)
    g = _g(spark, [("iri", "a", V + "p", "iri", "b", None, None)])
    out = rule_closure(
        g, f"[ax: -> (<{V}engine> <{V}version> '1')]\n"
           f"[r: (?x <{V}p> ?y) -> (?y <{V}p> ?x)]")
    assert _rows(out, V + "version") == [(V + "engine", "1", None, "literal")]
    assert out.count() == 3
    # an axiom with a head VARIABLE has nothing to bind it — loud error
    with pytest.raises(ValueError, match="unbound"):
        rule_closure(g, f"[ax: -> (?a <{V}q> ?a)]").count()


def test_rdfs_rules_match_dedicated_reasoner(spark):
    """Cross-engine parity: the ρdf core of Jena's ``etc/rdfs.rules``
    written as USER rules and run through the generic engine must equal
    the dedicated stratified reasoner (``pipeline/inference.rdfs_closure``)
    on the same graph — the same check Jena gets for free by running
    both RDFSRuleReasoner and GenericRuleReasoner off one rule file."""
    from jena_spark.pipeline.inference import rdfs_closure

    RDFS = "http://www.w3.org/2000/01/rdf-schema#"
    g = _g(spark, [
        # TBox
        ("iri", V + "mentions", RDFS + "subPropertyOf", "iri", V + "refersTo", None, None),
        ("iri", V + "refersTo", RDFS + "subPropertyOf", "iri", V + "relatesTo", None, None),
        ("iri", V + "mentions", RDFS + "domain", "iri", V + "Turn", None, None),
        ("iri", V + "mentions", RDFS + "range", "iri", V + "Entity", None, None),
        ("iri", V + "Entity", RDFS + "subClassOf", "iri", V + "Thing", None, None),
        # ABox
        ("iri", "t1", V + "mentions", "iri", "e1", None, None),
        ("iri", "t2", V + "mentions", "iri", "e2", None, None),
        ("iri", "t2", V + "mentions", "literal", "a literal", None, None),
        ("iri", "x", TM.RDF_TYPE, "iri", V + "Entity", None, None),
    ])
    # the built-in RDFS library (@include <rdfs>, Rule.java:558)
    generic = rule_closure(g, "@include <rdfs>.")
    dedicated = rdfs_closure(g)
    sym_diff = generic.exceptAll(dedicated).unionByName(
        dedicated.exceptAll(generic))
    assert sym_diff.count() == 0


def test_head_constants_and_multi_head(spark):
    g = _g(spark, [("iri", "a", TM.RDF_TYPE, "iri", V + "Person", None, None)])
    out = rule_closure(
        g, "@prefix v: <http://ex/v#>.\n@prefix rdf: "
           "<http://www.w3.org/1999/02/22-rdf-syntax-ns#>.\n"
           "[r: (?x rdf:type v:Person) -> (?x rdf:type v:Agent), "
           "(?x v:status 'known')]")
    assert ("a", V + "Agent", None, "iri") in _rows(out, TM.RDF_TYPE)
    assert _rows(out, V + "status") == [("a", "known", None, "literal")]


# --- RDF list builtins ---------------------------------------------------------

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"


def _list_graph(spark):
    """s1 -> (a, "x", b); s2 -> (c)."""
    nil = RDF_NS + "nil"
    return _g(spark, [
        ("bnode", "l1", RDF_NS + "first", "iri", V + "a", None, None),
        ("bnode", "l1", RDF_NS + "rest", "bnode", "l2", None, None),
        ("bnode", "l2", RDF_NS + "first", "literal", "x", None, None),
        ("bnode", "l2", RDF_NS + "rest", "bnode", "l3", None, None),
        ("bnode", "l3", RDF_NS + "first", "iri", V + "b", None, None),
        ("bnode", "l3", RDF_NS + "rest", "iri", nil, None, None),
        ("bnode", "m1", RDF_NS + "first", "iri", V + "c", None, None),
        ("bnode", "m1", RDF_NS + "rest", "iri", nil, None, None),
        ("iri", "s1", V + "hasList", "bnode", "l1", None, None),
        ("iri", "s2", V + "hasList", "bnode", "m1", None, None),
    ])


def test_list_contains_filter(spark):
    # ListContains.java: member test against rdf:first/rdf:rest chains
    g = _list_graph(spark)
    out = rule_closure(
        g, f"[r: (?s <{V}hasList> ?l), listContains(?l, <{V}a>) "
           f"-> (?s <{V}hasA> 'y')]")
    assert _rows(out, V + "hasA") == [("s1", "y", None, "literal")]


def test_list_not_contains(spark):
    g = _list_graph(spark)
    out = rule_closure(
        g, f"[r: (?s <{V}hasList> ?l), listNotContains(?l, <{V}a>) "
           f"-> (?s <{V}noA> 'y')]")
    assert _rows(out, V + "noA") == [("s2", "y", None, "literal")]


def test_list_contains_binder_enumerates_members(spark):
    # unbound second arg: one binding per member, tail cells included
    g = _list_graph(spark)
    out = rule_closure(
        g, f"[r: (?s <{V}hasList> ?l), listContains(?l, ?m) "
           f"-> (?s <{V}member> ?m)]")
    assert _rows(out, V + "member") == sorted([
        ("s1", V + "a", None, "iri"),
        ("s1", "x", None, "literal"),
        ("s1", V + "b", None, "iri"),
        ("s2", V + "c", None, "iri"),
    ])


def test_list_map_as_object_head(spark):
    # ListMapAsObject.java: head fires once per member as the object
    g = _list_graph(spark)
    out = rule_closure(
        g, f"[r: (?s <{V}hasList> ?l) -> listMapAsObject(?s, <{V}item>, ?l)]")
    assert _rows(out, V + "item") == sorted([
        ("s1", V + "a", None, "iri"),
        ("s1", "x", None, "literal"),
        ("s1", V + "b", None, "iri"),
        ("s2", V + "c", None, "iri"),
    ])


def test_list_map_as_subject_head(spark):
    # ListMapAsSubject.java: each member becomes the asserted subject
    g = _list_graph(spark)
    out = rule_closure(
        g, f"[r: (<s2> <{V}hasList> ?l) "
           f"-> listMapAsSubject(?l, rdf:type, <{V}Thing>)]")
    typed = _rows(out, TM.RDF_TYPE)
    assert (V + "c", V + "Thing", None, "iri") in typed
    assert all(row[0] != V + "a" for row in typed)


def test_unsupported_head_builtin_still_raises(spark):
    with pytest.raises(ValueError, match="head builtin"):
        parse_rules(f"[r: (?a <{V}p> ?b) -> print(?a)]")
    # backward rules keep the restriction: no procedural heads
    with pytest.raises(ValueError, match="head builtin"):
        parse_rules(
            f"[r: listMapAsSubject(?l, rdf:type, <{V}T>) <- (?s <{V}p> ?l)]")


def test_owl_library_class_expressions(spark):
    """owl-fb.rules forward class-expression extraction: C ≡ A ⊓ B makes
    C a subclass of each conjunct; U ⊇ each disjunct of owl:unionOf.
    With the RDFS core included, instance types propagate through."""
    OWL = "http://www.w3.org/2002/07/owl#"
    RDFS = "http://www.w3.org/2000/01/rdf-schema#"
    nil = RDF_NS + "nil"
    g = _g(spark, [
        # C owl:intersectionOf (A B)
        ("iri", V + "C", OWL + "intersectionOf", "bnode", "i1", None, None),
        ("bnode", "i1", RDF_NS + "first", "iri", V + "A", None, None),
        ("bnode", "i1", RDF_NS + "rest", "bnode", "i2", None, None),
        ("bnode", "i2", RDF_NS + "first", "iri", V + "B", None, None),
        ("bnode", "i2", RDF_NS + "rest", "iri", nil, None, None),
        # U owl:unionOf (A D)
        ("iri", V + "U", OWL + "unionOf", "bnode", "u1", None, None),
        ("bnode", "u1", RDF_NS + "first", "iri", V + "A", None, None),
        ("bnode", "u1", RDF_NS + "rest", "bnode", "u2", None, None),
        ("bnode", "u2", RDF_NS + "first", "iri", V + "D", None, None),
        ("bnode", "u2", RDF_NS + "rest", "iri", nil, None, None),
        ("iri", V + "E", OWL + "equivalentClass", "iri", V + "A", None, None),
        ("iri", "x", TM.RDF_TYPE, "iri", V + "C", None, None),
        ("iri", "y", TM.RDF_TYPE, "iri", V + "D", None, None),
    ])
    out = rule_closure(g, "@include <owl>.\n@include <rdfs>.")
    types = _rows(out, TM.RDF_TYPE)
    # x : C ⇒ x : A and x : B (intersection extraction + rdfs9)
    assert ("x", V + "A", None, "iri") in types
    assert ("x", V + "B", None, "iri") in types
    # y : D ⇒ y : U (union extraction + rdfs9)
    assert ("y", V + "U", None, "iri") in types
    # x : A ⇒ x : E (equivalentClass both directions + rdfs9)
    assert ("x", V + "E", None, "iri") in types
    sub = _rows(out, RDFS + "subClassOf")
    assert (V + "C", V + "A", None, "iri") in sub
    assert (V + "A", V + "U", None, "iri") in sub
