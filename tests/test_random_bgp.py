"""Randomized BGP workload vs DuckDB — the genQueries parity layer.

Reference: the fork's ``genQueries`` module generates seeded random
query workloads in fixed shapes — star (Find_S1–S4), chain (Find_P2),
T-shaped (Find_T*), generic join (Find_J3) — and runs them as a suite
(``genQueries/src/main/java/cl/uc/ing/benchmark/tdb2/Find_J3.java:27-28,105,121``).
Here: a seeded generator produces BGPs in the same shapes over the
sf0.001 KG; each runs through the algebra layer AND as dynamically
generated SQL in DuckDB over the identical triples CTE; result sets
must match exactly.
"""

from __future__ import annotations

import random
import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from jena_spark import terms as TM  # noqa: E402
from jena_spark.oracle.duck import triples_with  # noqa: E402
from jena_spark.queries import algebra as A  # noqa: E402
from jena_spark.queries.algebra import Var  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not Path(SF_DIR).exists(), reason="driver testdata not present"
)

# predicates whose subject is a turn bnode — any two share subjects
TURN_PREDS = [TM.P_TURN_INDEX, TM.P_ROLE, TM.P_TEXT, TM.P_TOOL,
              TM.P_TS, TM.P_MENTIONS]
# composable 2-chains: object kind of the first = subject kind of the second
CHAINS = [(TM.P_HAS_TURN, tp) for tp in TURN_PREDS] + [(TM.P_MENTIONS, TM.RDFS_LABEL)]
# predicates with shared (non-unique) objects for inverted-T joins
SHARED_OBJ_PREDS = [TM.P_MENTIONS, TM.P_TOOL]


def _shape(rng: random.Random) -> list:
    """One random BGP in a genQueries shape over vars a/b/c/d —
    predicate choices respect the KG's composition structure so the
    workload exercises non-empty joins (the reference's generators are
    data-driven for the same reason, ``Find_J3.java:105``)."""
    tp = lambda: rng.choice(TURN_PREDS)  # noqa: E731
    kind = rng.choice(["star2", "star3", "chain2", "join3", "t2"])
    if kind == "star2":
        return [(Var("a"), tp(), Var("b")), (Var("a"), tp(), Var("c"))]
    if kind == "star3":
        return [(Var("a"), tp(), Var("b")), (Var("a"), tp(), Var("c")),
                (Var("a"), tp(), Var("d"))]
    if kind == "chain2":
        p1, p2 = rng.choice(CHAINS)
        return [(Var("a"), p1, Var("b")), (Var("b"), p2, Var("c"))]
    if kind == "join3":
        return [(Var("a"), TM.P_HAS_TURN, Var("b")), (Var("b"), tp(), Var("c")),
                (Var("a"), TM.P_HAS_TURN, Var("d"))]
    p = rng.choice(SHARED_OBJ_PREDS)
    return [(Var("a"), p, Var("b")), (Var("c"), p, Var("b"))]  # inverted T


def _bgp_to_sql(patterns) -> str:
    """Compile a BGP (vars + constant predicates) to a DuckDB self-join
    over the ``triples`` CTE, projecting each variable's lexical value
    (the SQL twin of algebra.bgp + flatten)."""
    first_pos: dict[str, tuple[int, str]] = {}
    conds: list[str] = []
    for i, (s, p, o) in enumerate(patterns):
        conds.append(f"t{i}.p_val = '{p}'")
        for term, pos in ((s, "s"), (o, "o")):
            col = f"t{i}.{pos}_val"
            kindcol = f"t{i}.{pos}_kind"
            if isinstance(term, Var):
                if term.name in first_pos:
                    j, prev = first_pos[term.name]
                    # whole-term equality (kind and val; datatype/lang
                    # matter only for o-o joins)
                    pj, posj = prev, prev.replace("_val", "_kind")
                    conds.append(f"{col} = {pj}")
                    conds.append(f"{kindcol} = {posj}")
                    if pos == "o" and prev.endswith("o_val"):
                        pidx = prev.split(".")[0]
                        conds.append(
                            f"t{i}.o_datatype IS NOT DISTINCT FROM {pidx}.o_datatype"
                        )
                        conds.append(
                            f"t{i}.o_lang IS NOT DISTINCT FROM {pidx}.o_lang"
                        )
                else:
                    first_pos[term.name] = (i, col)
    proj = ", ".join(
        f"{col} AS {name}" for name, (_, col) in sorted(first_pos.items())
    )
    froms = ", ".join(f"triples t{i}" for i in range(len(patterns)))
    return (
        triples_with()
        + f"SELECT DISTINCT {proj} FROM {froms} WHERE "
        + " AND ".join(conds)
    )


def test_random_bgp_workload_matches_duckdb(spark):
    from jena_spark.queries import registry as R

    t = R._triples(spark, SF_DIR)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{SF_DIR}/events.parquet'")

    rng = random.Random(4242)
    n_nonempty = 0
    for qi in range(12):
        patterns = _shape(rng)
        vars_ = sorted({x.name for pat in patterns for x in pat if isinstance(x, Var)})
        flat = A.flatten(A.project(A.bgp(t, patterns), *vars_), vars_).distinct()
        got = {tuple("" if v is None else v for v in r) for r in flat.collect()}
        want = {
            tuple("" if v is None else v for v in r)
            for r in con.sql(_bgp_to_sql(patterns)).fetchall()
        }
        assert got == want, f"query {qi} shape mismatch: {patterns}"
        n_nonempty += bool(got)
    # the workload must actually exercise joins, not just empty results
    assert n_nonempty >= 10


def test_stats_reorder_rare_predicate_first():
    """ReorderWeighted parity: with collected predicate counts, the
    stats order must (a) never lead with a pattern whose predicate is
    unfiltered (variable) or corpus-dominating, (b) lead with the
    rarest-predicate pattern among equally-shaped candidates."""
    counts = {"p:rare": 10, "p:common": 100_000, "p:mid": 5_000}
    pats = [
        (Var("a"), "p:common", Var("b")),
        (Var("b"), "p:rare", Var("c")),
        (Var("c"), "p:mid", Var("d")),
    ]
    out = A.reorder_patterns_stats(pats, counts)
    assert out[0][1] == "p:rare"
    # fixed weights alone (?P? = 30 for all three) could pick any —
    # the stats break the tie toward rare-first, then substitution
    # makes the connected pattern cheaper
    assert [p[1] for p in out] == ["p:rare", "p:mid", "p:common"]

    # a fully unbound (???) pattern never goes first when ANY pattern
    # has a concrete predicate
    pats2 = [(Var("x"), Var("p"), Var("y")), (Var("x"), "p:common", Var("z"))]
    out2 = A.reorder_patterns_stats(pats2, counts)
    assert out2[0][1] == "p:common"


def test_stats_reordered_bgp_same_results(spark):
    """Stats-fed order returns the identical result set AND never joins
    the unfiltered-predicate pattern first on the real KG workload."""
    from jena_spark.queries import registry as R

    t = R._triples(spark, SF_DIR)
    counts = A.pred_counts_of(t)
    assert counts[TM.P_MENTIONS] != counts[TM.P_ROLE]  # sanity: stats differ

    rng = random.Random(777)
    for _ in range(6):
        patterns = _shape(rng)
        vars_ = sorted({x.name for pat in patterns for x in pat if isinstance(x, Var)})
        a = A.flatten(A.project(A.bgp(t, patterns, pred_counts=counts), *vars_), vars_)
        b = A.flatten(A.project(A.bgp(t, patterns, reorder=False), *vars_), vars_)
        assert {tuple(r) for r in a.collect()} == {tuple(r) for r in b.collect()}
        # the chosen leader is minimal-cardinality among the patterns
        ordered = A.reorder_patterns_stats(patterns, counts)
        lead = ordered[0][1]
        assert counts.get(lead, 0) == min(counts.get(p[1], 0) for p in patterns)


def _pattern_to_sparql(patterns) -> str:
    """Serialize a generated BGP to SPARQL text."""
    lines = []
    for s, p, o in patterns:
        def t(x):
            return f"?{x.name}" if isinstance(x, Var) else f"<{x}>"
        lines.append(f"{t(s)} <{p}> {t(o)} .")
    return "SELECT * WHERE { " + " ".join(lines) + " }"


def test_sparql_string_equals_algebra_on_random_workload(spark):
    """Parser↔algebra equivalence on the seeded random BGP workload:
    the SPARQL-text rendering of each generated shape returns exactly
    the algebra layer's result set."""
    from jena_spark.queries import registry as R
    from jena_spark.queries.sparql import sparql_query

    t = R._triples(spark, SF_DIR)
    rng = random.Random(991)
    n_nonempty = 0
    for _ in range(8):
        patterns = _shape(rng)
        vars_ = sorted({x.name for pat in patterns for x in pat if isinstance(x, Var)})
        via_algebra = {
            tuple("" if v is None else v for v in r)
            for r in A.flatten(A.project(A.bgp(t, patterns), *vars_), vars_)
            .distinct().collect()
        }
        via_string = {
            tuple("" if v is None else v for v in (r[n] for n in vars_))
            for r in sparql_query(t, _pattern_to_sparql(patterns)).distinct().collect()
        }
        assert via_string == via_algebra, patterns
        n_nonempty += bool(via_algebra)
    assert n_nonempty >= 6
