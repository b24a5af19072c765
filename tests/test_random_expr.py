"""Randomized scalar-expression workload vs DuckDB — the expression
library's genQueries-style parity layer.

Seeded generator produces random expression trees over the ``events``
table from a grammar spanning the E_* families (§2.8: string ops,
numeric ops, comparisons, conditionals, arithmetic); each tree renders
BOTH as a Column over our SPARQL function registry AND as DuckDB SQL,
and the full result columns must match value-for-value. Numeric
expressions are generated over integer-safe operations so the
comparison is exact (no float formatting skew across engines).
"""

from __future__ import annotations

import random
import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from jena_spark.functions.scalar import SPARQL_FUNCTIONS as FN  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not Path(SF_DIR).exists(), reason="driver testdata not present"
)


class Gen:
    """One random expression = (spark Column, duckdb SQL, kind)."""

    def __init__(self, rng: random.Random):
        self.rng = rng

    # --- leaves ---
    def num_leaf(self):
        if self.rng.random() < 0.5:
            return F.col("event_id"), "event_id"
        k = self.rng.randint(1, 9)
        return F.lit(k).cast("long"), str(k)

    def str_leaf(self):
        if self.rng.random() < 0.6:
            return F.col("event_type"), "event_type"
        s = self.rng.choice(["click", "view", "pur", "xyz", "e"])
        return F.lit(s), f"'{s}'"

    # --- integer-exact numeric expressions ---
    def num(self, depth: int = 0):
        if depth >= 2 or self.rng.random() < 0.35:
            return self.num_leaf()
        op = self.rng.choice(["add", "sub", "mul", "mod", "abs", "strlen", "if"])
        if op == "strlen":
            c, q = self.str(depth + 1)
            return FN["strlen"](c).cast("long"), f"CAST(length({q}) AS BIGINT)"
        if op == "abs":
            c, q = self.num(depth + 1)
            return FN["abs"](c), f"abs({q})"
        if op == "if":
            b, bq = self.boolean(depth + 1)
            t, tq = self.num(depth + 1)
            e, eq = self.num(depth + 1)
            return (FN["if"](b, t, e),
                    f"CASE WHEN {bq} THEN {tq} ELSE {eq} END")
        a, aq = self.num(depth + 1)
        b, bq = self.num(depth + 1)
        if op == "add":
            return FN["add"](a, b), f"({aq} + {bq})"
        if op == "sub":
            return FN["subtract"](a, b), f"({aq} - {bq})"
        if op == "mul":
            # keep magnitudes bounded: multiply by a small literal only
            k = self.rng.randint(1, 5)
            return FN["multiply"](a, F.lit(k)), f"({aq} * {k})"
        # mod by a non-zero literal
        k = self.rng.randint(2, 13)
        return a % k, f"({aq} % {k})"

    # --- string expressions ---
    def str(self, depth: int = 0):
        if depth >= 2 or self.rng.random() < 0.4:
            return self.str_leaf()
        op = self.rng.choice(["ucase", "lcase", "concat", "substr",
                              "strbefore", "strafter", "replace"])
        a, aq = self.str(depth + 1)
        if op == "ucase":
            return FN["ucase"](a), f"upper({aq})"
        if op == "lcase":
            return FN["lcase"](a), f"lower({aq})"
        if op == "concat":
            b, bq = self.str(depth + 1)
            return FN["concat"](a, b), f"({aq} || {bq})"
        if op == "substr":
            start = self.rng.randint(1, 3)
            ln = self.rng.randint(1, 4)
            return (FN["substr"](a, start, ln),
                    f"substr({aq}, {start}, {ln})")
        if op == "strbefore":
            sep = self.rng.choice(["i", "e", "w"])
            # SPARQL STRBEFORE: '' when the separator is absent
            return (FN["strbefore"](a, sep),
                    f"CASE WHEN position('{sep}' IN {aq}) > 0 "
                    f"THEN substr({aq}, 1, position('{sep}' IN {aq}) - 1) "
                    f"ELSE '' END")
        if op == "strafter":
            sep = self.rng.choice(["i", "e", "w"])
            return (FN["strafter"](a, sep),
                    f"CASE WHEN position('{sep}' IN {aq}) > 0 "
                    f"THEN substr({aq}, position('{sep}' IN {aq}) + {len('x')}) "
                    f"ELSE '' END")
        old = self.rng.choice(["c", "ie", "w"])
        new = self.rng.choice(["_", "XX", ""])
        return (FN["replace"](a, old, new),
                f"replace({aq}, '{old}', '{new}')")

    # --- boolean expressions ---
    def boolean(self, depth: int = 0):
        if depth >= 2:
            a, aq = self.num(depth + 1)
            k = self.rng.randint(0, 9)
            return a > k, f"({aq} > {k})"
        op = self.rng.choice(["gt", "le", "eq_s", "contains", "strstarts",
                              "and", "or", "not", "in"])
        if op in ("and", "or"):
            a, aq = self.boolean(depth + 1)
            b, bq = self.boolean(depth + 1)
            if op == "and":
                return FN["and"](a, b), f"({aq} AND {bq})"
            return FN["or"](a, b), f"({aq} OR {bq})"
        if op == "not":
            a, aq = self.boolean(depth + 1)
            return FN["not"](a), f"(NOT {aq})"
        if op == "in":
            a, aq = self.str(depth + 1)
            vals = self.rng.sample(["click", "view", "error", "signup"], 2)
            lst = ", ".join(f"'{v}'" for v in vals)
            return FN["in"](a, *vals), f"({aq} IN ({lst}))"
        if op == "contains":
            a, aq = self.str(depth + 1)
            sub = self.rng.choice(["ic", "vi", "err", "e"])
            return FN["contains"](a, sub), f"contains({aq}, '{sub}')"
        if op == "strstarts":
            a, aq = self.str(depth + 1)
            pre = self.rng.choice(["c", "v", "si"])
            return FN["strstarts"](a, pre), f"starts_with({aq}, '{pre}')"
        a, aq = self.num(depth + 1)
        b, bq = self.num(depth + 1)
        if op == "gt":
            return FN["gt"](a, b), f"({aq} > {bq})"
        if op == "le":
            return FN["le"](a, b), f"({aq} <= {bq})"
        x, xq = self.str(depth + 1)
        y, yq = self.str(depth + 1)
        return FN["eq"](x, y), f"({xq} = {yq})"


@pytest.mark.parametrize("seed", [20260817, 4242, 777])
def test_random_expression_workload_matches_duckdb(spark, seed):
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{SF_DIR}/events.parquet'")
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")

    rng = random.Random(seed)
    gen = Gen(rng)
    cols, sqls = [], []
    for i in range(40):
        kind = rng.choice(["num", "str", "bool"])
        c, q = getattr(gen, kind if kind != "bool" else "boolean")()
        if kind == "bool":
            # normalize booleans to ints for cross-engine comparison
            c, q = c.cast("int"), f"CAST({q} AS INT)"
        cols.append(c.alias(f"e{i}"))
        sqls.append(f"{q} AS e{i}")

    got = ev.select(F.col("event_id"), *cols).orderBy("event_id").collect()
    want = con.sql(
        "SELECT event_id, " + ", ".join(sqls) + " FROM events ORDER BY event_id"
    ).fetchall()
    assert len(got) == len(want) and len(got) > 0
    names = ["event_id"] + [f"e{i}" for i in range(40)]
    for g, w in zip(got, want):
        for idx, n in enumerate(names):
            gv, wv = g[n], w[idx]
            assert gv == wv, (n, g["event_id"], gv, wv)


def test_iri_dispatched_standard_library(spark):
    """fn: / math: / afn: namespaces resolve by full IRI from SPARQL
    strings (StandardFunctions.java registration parity)."""
    from jena_spark.queries.sparql import sparql_query

    t = spark.createDataFrame(
        [("iri", "http://ex.org/ns#Thing", "http://v/label", "literal",
          "  Hello  World ", None, None)],
        "s_kind string, s_val string, p_val string, o_kind string,"
        " o_val string, o_datatype string, o_lang string")
    rows = sparql_query(t, """
        PREFIX fn: <http://www.w3.org/2005/xpath-functions#>
        PREFIX math: <http://www.w3.org/2005/xpath-functions/math#>
        PREFIX afn: <http://jena.apache.org/ARQ/function#>
        SELECT (fn:lower-case(?o) AS ?lc)
               (fn:normalize-space(?o) AS ?ns)
               (afn:localname(?s) AS ?ln)
               (afn:namespace(?s) AS ?nsp)
               (math:pow(2.0, 10.0) AS ?p)
               (afn:strjoin("-", "a", "b", "c") AS ?j)
        WHERE { ?s <http://v/label> ?o }""").collect()
    r = rows[0]
    assert r["lc"] == "  hello  world "
    assert r["ns"] == "Hello World"
    assert r["ln"] == "Thing" and r["nsp"] == "http://ex.org/ns#"
    assert float(r["p"]) == 1024.0
    assert r["j"] == "a-b-c"
