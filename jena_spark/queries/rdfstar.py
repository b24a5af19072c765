"""RDF-star: quoted-triple terms, annotation syntax, reification bridge.

Reference surface (paths relative to /root/reference):

* Quoted-triple node type: ``jena-core/.../graph/Node_Triple.java:27``
  (``Node.java:69`` ``isNodeTriple()``); equality is component-wise
  (``Node_Triple`` delegates to ``Triple`` equality).
* Triple-term functions afn:triple / afn:subject / afn:predicate /
  afn:object / afn:isTriple:
  ``jena-arq/src/test/.../expr/TestTripleTermFunctions.java:33``.
* Reification vocabulary rdf:Statement/subject/predicate/object:
  ``jena-core/.../vocabulary/RDF.java:61-69``; standard-reification
  encode/decode semantics follow ``rdf/model/impl/ReifierStd.java``
  (a statement is reified iff all of rdf:type rdf:Statement,
  rdf:subject, rdf:predicate, rdf:object are present for one node).

Spark mapping: a quoted triple is a term row with kind ``"triple"``
whose value is the CANONICAL N-Triples-star lexical ``<< s p o >>``
(``terms.quote``). Components are themselves canonical, so plain string
equality on the flattened columns IS Jena's component-wise quoted-triple
equality — no nested struct columns, no schema change, and every
existing join/dedup/set-op works on quoted terms unmodified.

Destructuring (``unquote_*``) runs JVM-side via ``regexp_extract`` for
terms of nesting depth <= MAX_REGEX_DEPTH (components may themselves be
quoted triples one level down). Deeper terms take the pure-Python
``parse_quoted`` path (Arrow-batched). All lexicals in the engine are
produced by :func:`quote_col` / ``terms.quote`` and are therefore
canonical; the regexes rely on that invariant (single-space separators).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from jena_spark import terms as TM
from jena_spark.sources.ntriples import _escape, _unescape

RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDF_STATEMENT = RDF + "Statement"
RDF_SUBJECT = RDF + "subject"
RDF_PREDICATE = RDF + "predicate"
RDF_OBJECT = RDF + "object"

# statement-bnode skolem scope (deterministic: one bnode per distinct
# quoted-triple lexical — ReifierStd's "one reification node per
# statement" posture made reproducible for distributed evaluation)
_SKOLEM_SCOPE = "rdfstar"


# === canonical lexical (Column twins of terms.nt_term / terms.quote) =========

def nt_term_col(kind: Column, val: Column, datatype: Column | None = None,
                lang: Column | None = None) -> Column:
    """Canonical N-Triples lexical of one term, JVM-side. Accepts both
    NULL and ``""`` (the expression layer's convention) for an absent
    datatype/lang."""
    datatype = (F.nullif(datatype, F.lit("")) if datatype is not None
                else F.lit(None).cast("string"))
    lang = (F.nullif(lang, F.lit("")) if lang is not None
            else F.lit(None).cast("string"))
    lit_suffix = (
        F.when(lang.isNotNull(), F.concat(F.lit("@"), lang))
        .when(datatype.isNotNull(), F.concat(F.lit("^^<"), datatype, F.lit(">")))
        .otherwise(F.lit(""))
    )
    return (
        F.when(kind == TM.KIND_IRI, F.concat(F.lit("<"), val, F.lit(">")))
        .when(kind.isin(TM.KIND_BNODE, TM.KIND_TRIPLE), val)
        .otherwise(F.concat(F.lit('"'), _escape(val), F.lit('"'), lit_suffix))
    )


def quote_col(s_kind: Column, s_val: Column, p_val: Column, o_kind: Column,
              o_val: Column, o_datatype: Column | None = None,
              o_lang: Column | None = None) -> Column:
    """Canonical ``<< s p o >>`` lexical — Column twin of ``terms.quote``
    (lock-step asserted in tests/test_rdfstar.py)."""
    return F.concat(
        F.lit("<< "), nt_term_col(s_kind, s_val),
        F.lit(" <"), p_val, F.lit("> "),
        nt_term_col(o_kind, o_val, o_datatype, o_lang), F.lit(" >>"),
    )


def quoted_of_row() -> Column:
    """Quoted-triple lexical of the current triple row (TERM_COLS)."""
    return quote_col(
        F.col("s_kind"), F.col("s_val"), F.col("p_val"),
        F.col("o_kind"), F.col("o_val"), F.col("o_datatype"), F.col("o_lang"),
    )


# === destructuring ===========================================================

_IRI = r"<[^<>]*>"
_BNODE = r"_:[^\s]+"
_LITERAL = r'"(?:[^"\\]|\\.)*"(?:\^\^<[^>]*>|@[A-Za-z0-9][A-Za-z0-9-]*)?'

#: regex destructuring handles quoted terms whose components are quoted
#: triples at most this deep (total term depth MAX_REGEX_DEPTH + 1)
MAX_REGEX_DEPTH = 2


def _component_pat(depth: int) -> str:
    """Regex for one component term; components may be quoted triples
    nested up to ``depth`` levels. All groups non-capturing."""
    flat = f"(?:{_IRI}|{_BNODE}|{_LITERAL})"
    pat = flat
    for _ in range(depth):
        qt = rf"<< {pat} {_IRI} {pat} >>"
        pat = f"(?:{flat}|{qt})"
    return pat


_COMP = _component_pat(MAX_REGEX_DEPTH - 1)
_FULL = rf"^<< ({_COMP}) <([^<>]*)> ({_COMP}) >>$"


def term_struct_col(raw: Column) -> Column:
    """Raw canonical N-Triples(-star) term lexical -> struct
    (kind, val, datatype, lang) — the expression layer's term shape."""
    is_qt = raw.startswith("<<")
    is_iri = raw.startswith("<") & ~is_qt
    is_bnode = raw.startswith("_:")
    quoted = F.regexp_extract(raw, r'^"((?:[^"\\]|\\.)*)"', 1)
    datatype = F.nullif(F.regexp_extract(raw, r"\^\^<([^>]*)>$", 1), F.lit(""))
    lang = F.nullif(F.regexp_extract(raw, r'"@([A-Za-z0-9-]+)$', 1), F.lit(""))
    kind = (
        F.when(is_qt, TM.KIND_TRIPLE)
        .when(is_iri, TM.KIND_IRI)
        .when(is_bnode, TM.KIND_BNODE)
        .otherwise(TM.KIND_LITERAL)
    )
    val = (
        F.when(is_qt | is_bnode, raw)
        .when(is_iri, F.regexp_extract(raw, r"^<(.*)>$", 1))
        .otherwise(_unescape(quoted))
    )
    return F.struct(
        kind.alias("kind"), val.alias("val"),
        F.when(is_qt | is_iri | is_bnode, F.lit(None).cast("string"))
        .otherwise(datatype).alias("datatype"),
        F.when(is_qt | is_iri | is_bnode, F.lit(None).cast("string"))
        .otherwise(lang).alias("lang"),
    )


def unquote_cols(lex: Column) -> tuple[Column, Column, Column]:
    """Quoted-triple lexical -> (subject struct, predicate iri, object
    struct). JVM ``regexp_extract`` (whole-stage codegen); handles
    nesting depth <= MAX_REGEX_DEPTH. Non-matching input (not a quoted
    triple, or too deep) yields NULL-valued structs — callers that must
    handle arbitrary depth use :func:`unquote_deep`."""
    s_raw = F.nullif(F.regexp_extract(lex, _FULL, 1), F.lit(""))
    p_iri = F.nullif(F.regexp_extract(lex, _FULL, 2), F.lit(""))
    o_raw = F.nullif(F.regexp_extract(lex, _FULL, 3), F.lit(""))
    return term_struct_col(s_raw), p_iri, term_struct_col(o_raw)


# --- pure-Python twin (arbitrary depth; oracle + deep fallback) --------------

def _scan_term(s: str, i: int) -> tuple[tuple, int]:
    """Scan one canonical term at s[i:]; return ((kind,val,dt,lang), j)."""
    if s.startswith("<< ", i):
        start = i
        _, j = _scan_term(s, i + 3)           # subject
        j += 1                                 # separator space
        _, j = _scan_term(s, j)                # predicate (an IRI)
        j += 1
        _, j = _scan_term(s, j)                # object
        if not s.startswith(" >>", j):
            raise ValueError(f"bad quoted-triple lexical at {i}: {s!r}")
        j += 3
        return (TM.KIND_TRIPLE, s[start:j], None, None), j
    if s.startswith("<", i):
        j = s.index(">", i)
        return (TM.KIND_IRI, s[i + 1:j], None, None), j + 1
    if s.startswith("_:", i):
        j = i
        while j < len(s) and not s[j].isspace():
            j += 1
        return (TM.KIND_BNODE, s[i:j], None, None), j
    if s.startswith('"', i):
        j = i + 1
        while s[j] != '"':
            j += 2 if s[j] == "\\" else 1
        lex = s[i + 1:j]
        # order-independent double-backslash handling (NUL sentinel,
        # same trick as sources.ntriples._unescape)
        val = (lex.replace("\\\\", "\x00").replace("\\t", "\t")
               .replace("\\n", "\n").replace("\\r", "\r")
               .replace('\\"', '"').replace("\x00", "\\"))
        j += 1
        if s.startswith("^^<", j):
            k = s.index(">", j)
            return (TM.KIND_LITERAL, val, s[j + 3:k], None), k + 1
        if s.startswith("@", j):
            k = j + 1
            while k < len(s) and (s[k].isalnum() or s[k] == "-"):
                k += 1
            return (TM.KIND_LITERAL, val, None, s[j + 1:k]), k
        return (TM.KIND_LITERAL, val, None, None), j
    raise ValueError(f"bad term lexical at {i}: {s!r}")


def parse_quoted(lex: str) -> tuple[tuple, str, tuple]:
    """Quoted-triple lexical -> (s_term, p_iri, o_term); terms are
    (kind, val, datatype, lang). Arbitrary nesting depth. Pure-Python
    twin of :func:`unquote_cols` (lock-step: property-tested)."""
    if not (lex.startswith("<< ") and lex.endswith(" >>")):
        raise ValueError(f"not a quoted-triple lexical: {lex!r}")
    s_term, i = _scan_term(lex, 3)
    p_term, i = _scan_term(lex, i + 1)
    o_term, i = _scan_term(lex, i + 1)
    if lex[i:] != " >>":
        raise ValueError(f"trailing content in quoted-triple lexical: {lex!r}")
    if p_term[0] != TM.KIND_IRI:
        raise ValueError(f"quoted-triple predicate must be an IRI: {lex!r}")
    return s_term, p_term[1], o_term


def unquote_deep(df: DataFrame, lex_col: str = "s_val") -> DataFrame:
    """Arbitrary-depth destructuring via Arrow-batched ``mapInPandas``
    (the documented slow path — only needed past MAX_REGEX_DEPTH)."""
    import pandas as pd

    in_cols = df.columns

    def _run(batches):
        for pdf in batches:
            parsed = [parse_quoted(v) for v in pdf[lex_col]]
            out = pdf.copy()
            for idx, name in ((0, "q_s"), (2, "q_o")):
                for fi, fld in enumerate(("kind", "val", "datatype", "lang")):
                    out[f"{name}_{fld}"] = [p[idx][fi] for p in parsed]
            out["q_p_val"] = [p[1] for p in parsed]
            yield out

    extra = ("q_s_kind string, q_s_val string, q_s_datatype string, "
             "q_s_lang string, q_o_kind string, q_o_val string, "
             "q_o_datatype string, q_o_lang string, q_p_val string")
    schema = ", ".join(f"{c} string" for c in in_cols) + ", " + extra
    return df.mapInPandas(_run, schema)


# === annotation (Turtle-star {| ... |} semantics as a DataFrame op) ==========

def annotate(triples: DataFrame, p_val: str, o_kind: str, o_val: Column,
             o_datatype: str | None = None, o_lang: str | None = None) -> DataFrame:
    """Statement-level metadata: for every input triple row emit
    ``<< s p o >> <p_val> obj`` — the relational form of Turtle-star's
    annotation syntax ``s p o {| <p_val> obj |}``. The quoted term is
    built once per row, JVM-side; no shuffle is introduced (narrow
    projection), so this scales with the input scan. If the input has a
    ``graph`` column, annotations stay in the annotated statement's
    graph."""
    sel = [
        F.lit(TM.KIND_TRIPLE).alias("s_kind"),
        quoted_of_row().alias("s_val"),
        F.lit(p_val).alias("p_val"),
        F.lit(o_kind).alias("o_kind"),
        o_val.cast("string").alias("o_val"),
        F.lit(o_datatype).cast("string").alias("o_datatype"),
        F.lit(o_lang).cast("string").alias("o_lang"),
    ]
    if "graph" in triples.columns:
        sel.append(F.col("graph"))
    return triples.select(*sel)


def is_quoted(col: Column) -> Column:
    return col.startswith("<<")


# === standard-reification bridge =============================================

def statement_bnode_col(lex: Column) -> Column:
    """Deterministic reification node for a quoted-triple lexical."""
    return TM.skolem_col(F.lit(_SKOLEM_SCOPE), lex)


def statement_bnode(lex: str) -> str:
    """Pure twin of :func:`statement_bnode_col` (oracle side)."""
    return TM.skolem(_SKOLEM_SCOPE, lex)


def _distinct_quoted(df: DataFrame) -> DataFrame:
    """Distinct quoted-triple lexicals appearing in subject or object
    position, PLUS (fixpoint) quoted components of those terms."""
    qs = (
        df.where(F.col("s_kind") == TM.KIND_TRIPLE).select(F.col("s_val").alias("lex"))
        .unionByName(
            df.where(F.col("o_kind") == TM.KIND_TRIPLE).select(F.col("o_val").alias("lex"))
        )
        .distinct()
        # consumed by the fixpoint loop (anti-join) AND the caller —
        # cut the plan so the input scan runs once
        .localCheckpoint(eager=False)
    )
    # quoted components one level down (loop bounded by NESTING DEPTH,
    # not data size — each round is one distinct+anti-join over the
    # small distinct-quoted-term frame)
    frontier = qs
    while True:
        s_t, _p, o_t = unquote_cols(F.col("lex"))
        comp = frontier.select(s_t.alias("s_t"), o_t.alias("o_t"))
        nested = (
            comp.where(F.col("s_t.kind") == TM.KIND_TRIPLE)
            .select(F.col("s_t.val").alias("lex"))
            .unionByName(
                comp.where(F.col("o_t.kind") == TM.KIND_TRIPLE)
                .select(F.col("o_t.val").alias("lex"))
            )
            .distinct()
            .join(qs, "lex", "left_anti")
        )
        if nested.isEmpty():
            return qs
        qs = qs.unionByName(nested)
        frontier = nested


def to_reification(df: DataFrame) -> DataFrame:
    """RDF-star graph -> standard reification (rdf:Statement /
    rdf:subject / rdf:predicate / rdf:object), quoted terms replaced by
    deterministic per-lexical bnodes — the classic encoding
    (``ReifierStd.java`` vocabulary, made set-semantic and
    deterministic). Nested quoted triples reify recursively: a quoted
    component becomes that component's OWN statement bnode.

    Distributed shape: one distinct pass over the quoted terms, then
    narrow per-row rewrites; the only join keys are quoted-term
    lexicals. Round count of the inner fixpoint = nesting depth."""
    cols = [c for c in df.columns if c in TM.TRIPLE_COLS or c in TM.TERM_COLS]
    has_graph = "graph" in df.columns
    # the input feeds THREE scans (s-quoted filter, o-quoted filter,
    # the rewrite pass) — materialize it once instead of replaying its
    # upstream plan per consumer (union-subtree non-reuse trap;
    # measured best-of-3 at sf0.1: 3.37s -> 3.03s on the annotation
    # input — the replayed join is cheap there; deeper inputs gain more)
    df = df.localCheckpoint(eager=False)
    qs = _distinct_quoted(df.select(*cols))
    s_t, p_iri, o_t = unquote_cols(F.col("lex"))
    # `parts` feeds four union branches below — without a plan cut Spark
    # replays the whole distinct-quoted lineage once per branch (the
    # union-subtree non-reuse trap; measured 7.1s -> ~2s at sf0.1)
    parts = qs.select(
        statement_bnode_col(F.col("lex")).alias("stmt"),
        s_t.alias("s_t"), p_iri.alias("p_iri"), o_t.alias("o_t"),
    ).localCheckpoint(eager=False)

    def _component(side: str) -> list[Column]:
        t = F.col(f"{side}_t")
        kind = F.when(t.getField("kind") == TM.KIND_TRIPLE, TM.KIND_BNODE).otherwise(
            t.getField("kind"))
        val = F.when(
            t.getField("kind") == TM.KIND_TRIPLE,
            statement_bnode_col(t.getField("val")),
        ).otherwise(t.getField("val"))
        return [kind, val, t.getField("datatype"), t.getField("lang")]

    def _row(p: str, okind, oval, odt=None, olang=None):
        sel = [
            F.lit(TM.KIND_BNODE).alias("s_kind"), F.col("stmt").alias("s_val"),
            F.lit(p).alias("p_val"),
            okind.alias("o_kind") if isinstance(okind, Column) else F.lit(okind).alias("o_kind"),
            oval.alias("o_val"),
            (odt if odt is not None else F.lit(None).cast("string")).alias("o_datatype"),
            (olang if olang is not None else F.lit(None).cast("string")).alias("o_lang"),
        ]
        if has_graph:
            sel.append(F.lit(None).cast("string").alias("graph"))
        return parts.select(*sel)

    sk, sv, _sd, _sl = _component("s")
    ok, ov, od, ol = _component("o")
    stmt_rows = (
        _row(TM.RDF_TYPE, TM.KIND_IRI, F.lit(RDF_STATEMENT))
        .unionByName(_row(RDF_SUBJECT, sk, sv))
        .unionByName(_row(RDF_PREDICATE, TM.KIND_IRI, F.col("p_iri")))
        .unionByName(_row(RDF_OBJECT, ok, ov, od, ol))
    )

    s_is_q = F.col("s_kind") == TM.KIND_TRIPLE
    o_is_q = F.col("o_kind") == TM.KIND_TRIPLE
    rewritten = df.select(
        *[
            F.when(s_is_q, F.lit(TM.KIND_BNODE)).otherwise(F.col(c)).alias(c)
            if c == "s_kind" else
            F.when(s_is_q, statement_bnode_col(F.col("s_val"))).otherwise(F.col(c)).alias(c)
            if c == "s_val" else
            F.when(o_is_q, F.lit(TM.KIND_BNODE)).otherwise(F.col(c)).alias(c)
            if c == "o_kind" else
            F.when(o_is_q, statement_bnode_col(F.col("o_val"))).otherwise(F.col(c)).alias(c)
            if c == "o_val" else F.col(c)
            for c in (TM.TRIPLE_COLS if has_graph else TM.TERM_COLS)
        ]
    )
    out_cols = TM.TRIPLE_COLS if has_graph else TM.TERM_COLS
    return rewritten.unionByName(stmt_rows.select(*out_cols)).dropDuplicates(out_cols)


def from_reification(df: DataFrame) -> DataFrame:
    """Standard reification -> RDF-star: complete reification quads
    (rdf:type rdf:Statement + subject + predicate + object, all on one
    node — ``ReifierStd`` completeness rule) become quoted-triple
    terms; the four encoding triples are removed; references to the
    statement node are replaced by the quoted term. Inverse of
    :func:`to_reification` (round-trip asserted in tests).

    Nested statements (a statement whose subject/object is itself a
    statement node) resolve innermost-first; the driver loop runs once
    per nesting level."""
    has_graph = "graph" in df.columns
    out_cols = TM.TRIPLE_COLS if has_graph else TM.TERM_COLS
    # the input feeds the typed/subject/predicate/object part frames,
    # the keep anti/semi pair and the reference-rewrite joins (~8
    # consumers) — cut the plan once or the upstream lineage replays
    # per consumer (measured 12.2s -> ~3s at sf0.1 when the input is
    # itself an unmaterialized to_reification plan)
    t = df.localCheckpoint(eager=False)

    typed = (
        t.where((F.col("p_val") == TM.RDF_TYPE)
                & (F.col("o_kind") == TM.KIND_IRI)
                & (F.col("o_val") == RDF_STATEMENT))
        .select(F.col("s_val").alias("stmt")).distinct()
    )

    def _part(pred: str, prefix: str) -> DataFrame:
        return (
            t.where(F.col("p_val") == pred)
            .select(
                F.col("s_val").alias("stmt"),
                F.col("o_kind").alias(f"{prefix}_kind"),
                F.col("o_val").alias(f"{prefix}_val"),
                F.col("o_datatype").alias(f"{prefix}_datatype"),
                F.col("o_lang").alias(f"{prefix}_lang"),
            )
        )

    stmts = (
        typed.join(_part(RDF_SUBJECT, "qs"), "stmt")
        .join(_part(RDF_PREDICATE, "qp"), "stmt")
        .join(_part(RDF_OBJECT, "qo"), "stmt")
        .where(F.col("qp_kind") == TM.KIND_IRI)
    ).localCheckpoint(eager=False)

    stmt_ids = stmts.select("stmt")
    # resolve innermost-first: a statement is resolvable when neither
    # component references a still-unresolved statement node
    resolved = None  # (stmt, lex)
    pending = stmts
    while not pending.isEmpty():
        pend_ids = pending.select("stmt")
        blocked_s = pending.join(
            pend_ids.withColumnRenamed("stmt", "qs_val"), "qs_val", "left_semi")
        blocked_o = pending.join(
            pend_ids.withColumnRenamed("stmt", "qo_val"), "qo_val", "left_semi")
        blocked_ids = blocked_s.select("stmt").unionByName(blocked_o.select("stmt")).distinct()
        ready = pending.join(blocked_ids, "stmt", "left_anti")
        if ready.isEmpty():
            raise ValueError("cyclic reification: statement nodes reference "
                             "each other — cannot decode to RDF-star")
        if resolved is not None:
            for side in ("qs", "qo"):
                ready = (
                    ready.join(
                        resolved.select(
                            F.col("stmt").alias(f"{side}_val_m"),
                            F.col("lex").alias(f"{side}_lex"),
                        ),
                        F.col(f"{side}_val") == F.col(f"{side}_val_m"),
                        "left",
                    )
                    .withColumn(
                        f"{side}_kind",
                        F.when(F.col(f"{side}_lex").isNotNull(), TM.KIND_TRIPLE)
                        .otherwise(F.col(f"{side}_kind")),
                    )
                    .withColumn(
                        f"{side}_val",
                        F.coalesce(F.col(f"{side}_lex"), F.col(f"{side}_val")),
                    )
                    .drop(f"{side}_val_m", f"{side}_lex")
                )
        lex = quote_col(
            F.col("qs_kind"), F.col("qs_val"), F.col("qp_val"),
            F.col("qo_kind"), F.col("qo_val"), F.col("qo_datatype"), F.col("qo_lang"),
        )
        new = ready.select("stmt", lex.alias("lex")).localCheckpoint(eager=False)
        resolved = new if resolved is None else resolved.unionByName(new)
        pending = pending.join(ready.select("stmt"), "stmt", "left_anti")

    if resolved is None:  # no reified statements at all
        return df.select(*out_cols)

    # drop the four encoding triples of decoded statements
    enc_preds = [TM.RDF_TYPE, RDF_SUBJECT, RDF_PREDICATE, RDF_OBJECT]
    keep = t.join(
        resolved.select(F.col("stmt").alias("s_val")),
        ["s_val"], "left_anti",
    ).unionByName(
        t.join(resolved.select(F.col("stmt").alias("s_val")), ["s_val"], "left_semi")
        .where(~F.col("p_val").isin(enc_preds))
    )
    # replace references to statement nodes with the quoted term
    for side_kind, side_val in (("s_kind", "s_val"), ("o_kind", "o_val")):
        keep = (
            keep.join(
                resolved.select(
                    F.col("stmt").alias(f"{side_val}_m"), F.col("lex").alias("_lex")),
                F.col(side_val) == F.col(f"{side_val}_m"),
                "left",
            )
            .withColumn(
                side_kind,
                F.when(F.col("_lex").isNotNull(), TM.KIND_TRIPLE).otherwise(F.col(side_kind)),
            )
            .withColumn(side_val, F.coalesce(F.col("_lex"), F.col(side_val)))
            .drop(f"{side_val}_m", "_lex")
        )
    return keep.select(*out_cols).dropDuplicates(out_cols)
