"""Property paths (SPARQL 1.1) over the triple table.

Reference: path classes ``jena-arq/.../sparql/path/P_*.java`` evaluated
by ``path/PathLib.java`` via ``OpPath`` (``OpExecutor.java:187``).
Fixed-length constructs compile to joins/unions of edge DataFrames (the
analog of ``TransformPathFlattern.java`` flattening paths into BGPs);
unbounded closure (``P_ZeroOrMore``/``P_OneOrMore``) is a driver-side
semi-naive iteration — the one operator family Catalyst cannot express
as a single plan (SURVEY.md §4.3), implemented the way GraphFrames does.

Edge representation: a DataFrame ``(src..., dst...)`` of node pairs,
each node a (kind, val) pair — predicates link terms, not just IRIs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PAIR_COLS = ["src_kind", "src_val", "dst_kind", "dst_val"]


def link(triples: DataFrame, pred: str) -> DataFrame:
    """P_Link: one predicate step s -> o."""
    return triples.where(F.col("p_val") == pred).select(
        F.col("s_kind").alias("src_kind"), F.col("s_val").alias("src_val"),
        F.col("o_kind").alias("dst_kind"), F.col("o_val").alias("dst_val"),
    )


def inverse(pairs: DataFrame) -> DataFrame:
    """P_Inverse (^p): swap endpoints."""
    return pairs.select(
        F.col("dst_kind").alias("src_kind"), F.col("dst_val").alias("src_val"),
        F.col("src_kind").alias("dst_kind"), F.col("src_val").alias("dst_val"),
    )


def seq(left: DataFrame, right: DataFrame) -> DataFrame:
    """P_Seq (p1/p2): relational composition."""
    l, r = left.alias("l"), right.alias("r")
    return (
        l.join(
            r,
            (F.col("l.dst_kind") == F.col("r.src_kind"))
            & (F.col("l.dst_val") == F.col("r.src_val")),
        )
        .select(
            F.col("l.src_kind").alias("src_kind"), F.col("l.src_val").alias("src_val"),
            F.col("r.dst_kind").alias("dst_kind"), F.col("r.dst_val").alias("dst_val"),
        )
        .distinct()
    )


def alt(left: DataFrame, right: DataFrame) -> DataFrame:
    """P_Alt (p1|p2): union."""
    return left.unionByName(right).distinct()


def neg_prop_set(triples: DataFrame, preds: list[str]) -> DataFrame:
    """P_NegPropSet (!(p1|p2|...)): any predicate except the set."""
    return triples.where(~F.col("p_val").isin(preds)).select(
        F.col("s_kind").alias("src_kind"), F.col("s_val").alias("src_val"),
        F.col("o_kind").alias("dst_kind"), F.col("o_val").alias("dst_val"),
    )


def fixed_length(pairs: DataFrame, n: int) -> DataFrame:
    """P_FixedLength (p{n}): n-fold composition."""
    assert n >= 1
    out = pairs
    for _ in range(n - 1):
        out = seq(out, pairs)
    return out


def mod_path(pairs: DataFrame, n: int, m: int) -> DataFrame:
    """P_Mod (p{n,m}): union of the n..m-fold compositions
    (``sparql/path/P_Mod.java``); n >= 1 here (use zero_or_* for n=0)."""
    assert 1 <= n <= m
    step = pairs.select(*PAIR_COLS).distinct()
    cur = fixed_length(step, n)
    out = cur
    for _ in range(n, m):
        cur = seq(cur, step)
        out = out.unionByName(cur)
    return out.distinct()


def one_or_more(pairs: DataFrame, max_iter: int = 30) -> DataFrame:
    """P_OneOrMore (p+): transitive closure, semi-naive iteration on
    DICTIONARY-ENCODED endpoints (TDB posture: joins run on 64-bit
    NodeIds, ``jena-tdb/.../store/NodeId.java:115-152``; only the final
    result decodes back, ``QueryIteratorIdToNode.java``).

    frontier_{k+1} = (frontier_k ∘ edges) − reached; each round is one
    join + one anti-join over 16-byte (src_id, dst_id) rows instead of
    ~100+ B string pairs — every closure round's shuffle moves ~6x
    fewer bytes and compares fixed-width longs. localCheckpoint cuts
    lineage per round. Rounds = O(longest simple path); for the
    O(log n) variant use the connected-components doubling — kept
    semi-naive because SPARQL closure must preserve (src, dst) pairs,
    not just components.

    Ids are xxhash64 content hashes of (kind, val) — collision odds
    ~n²/2⁶⁵ (cf. ``jena_spark.pipeline.encode`` collision policy); the
    driver-checked oracle (`kg_path_one_or_more` vs recursive SQL)
    guards the end-to-end result.
    """
    from jena_spark.pipeline.encode import term_id_col

    edges_t = pairs.select(*PAIR_COLS).distinct()
    null_s = F.lit(None).cast("string")

    def _nid(kind, val):
        return term_id_col(F.col(kind), F.col(val), null_s, null_s)

    nodes = (
        edges_t.select(F.col("src_kind").alias("kind"), F.col("src_val").alias("val"))
        .unionByName(
            edges_t.select(F.col("dst_kind").alias("kind"), F.col("dst_val").alias("val"))
        )
        .distinct()
        .select(
            term_id_col(F.col("kind"), F.col("val"), null_s, null_s).alias("node_id"),
            "kind", "val",
        )
        # eager checkpoint: the final decode consumes this frame TWICE
        # (src join + dst join) and Spark replays a subtree once per
        # consumer — uncheckpointed, the string-distinct node
        # derivation ran twice (measured 3.4 s × 2 of a 10.5 s query
        # at sf0.1; the repo's ≥2-consumer replay rule)
        .localCheckpoint(eager=True)
    )
    edges = (
        edges_t.select(
            _nid("src_kind", "src_val").alias("src"),
            _nid("dst_kind", "dst_val").alias("dst"),
        )
        .localCheckpoint(eager=True)
    )
    reached = edges
    frontier = edges
    for _ in range(max_iter):
        nxt = (
            frontier.alias("f")
            .join(edges.alias("e"), F.col("f.dst") == F.col("e.src"))
            .select(F.col("f.src").alias("src"), F.col("e.dst").alias("dst"))
            .distinct()
        )
        new = nxt.join(reached, ["src", "dst"], "left_anti").localCheckpoint(eager=True)
        if new.isEmpty():
            break
        # `reached` is a union of already-checkpointed frontier frames —
        # re-checkpointing the UNION would rewrite the whole closure
        # every round (O(rounds × |closure|) materialized bytes); the
        # plain union keeps lineage one level deep over cached blocks.
        reached = reached.unionByName(new)
        frontier = new
    s = nodes.select(F.col("node_id").alias("src"), F.col("kind").alias("src_kind"),
                     F.col("val").alias("src_val"))
    d = nodes.select(F.col("node_id").alias("dst"), F.col("kind").alias("dst_kind"),
                     F.col("val").alias("dst_val"))
    return reached.join(s, "src").join(d, "dst").select(*PAIR_COLS)


def zero_or_more(pairs: DataFrame, domain: DataFrame) -> DataFrame:
    """P_ZeroOrMore (p*): closure plus the identity over ``domain``
    (a (kind,val) node DataFrame — SPARQL evaluates x p* x for all
    terms in the graph)."""
    ident = domain.select(
        F.col("kind").alias("src_kind"), F.col("val").alias("src_val"),
        F.col("kind").alias("dst_kind"), F.col("val").alias("dst_val"),
    ).distinct()
    return one_or_more(pairs).unionByName(ident).distinct()


def zero_or_one(pairs: DataFrame, domain: DataFrame) -> DataFrame:
    """P_ZeroOrOne (p?)."""
    ident = domain.select(
        F.col("kind").alias("src_kind"), F.col("val").alias("src_val"),
        F.col("kind").alias("dst_kind"), F.col("val").alias("dst_val"),
    ).distinct()
    return pairs.select(*PAIR_COLS).unionByName(ident).distinct()
