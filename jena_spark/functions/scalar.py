"""SPARQL scalar functions → pyspark.sql.functions mapping.

Reference: the 78 ``E_*`` expression classes under
``jena-arq/src/main/java/org/apache/jena/sparql/expr/`` evaluated over
``NodeValue`` (``expr/NodeValue.java:60``). Each entry here is the
Spark Column equivalent; semantics notes cover the places SPARQL and
Spark SQL differ (registered-name comments give the E_ class).

The registry mirrors ``sparql/function/FunctionRegistry.java:32`` —
users can add custom scalar functions the way ARQ registers by-IRI
functions (``put``, ``FunctionRegistry.java:86``).
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F


def sparql_substr(c: Column, start, length=None) -> Column:
    """E_StrSubstring — SPARQL SUBSTR is 1-based like Spark's."""
    return F.substring(c, start, length) if length is not None else F.substring(c, start, 2_000_000_000)


def str_before(c: Column, sep) -> Column:
    """E_StrBefore: '' when sep absent (substring_index returns whole
    string then — guard with contains)."""
    return F.when(F.instr(c, sep) > 0, F.substring_index(c, sep, 1)).otherwise(F.lit(""))


def str_after(c: Column, sep) -> Column:
    return F.when(
        F.instr(c, sep) > 0,
        F.substring(c, F.instr(c, sep) + F.length(F.lit(sep)), 2_000_000_000),
    ).otherwise(F.lit(""))


def sparql_if(cond: Column, then: Column, otherwise: Column) -> Column:
    """E_Conditional."""
    return F.when(cond, then).otherwise(otherwise)


def _flags_prefix(flags: str | None):
    """SPARQL regex flags (XPath: i, s, m, x, q) -> Java inline flags.

    ``q`` (literal match) has no inline form — handled by quoting the
    pattern; unknown flags raise (matching ARQ's error behavior,
    ``expr/RegexJava.java``).
    """
    if not flags:
        return ""
    bad = set(flags) - set("ismxq")
    if bad:
        raise ValueError(f"unsupported regex flags: {''.join(sorted(bad))}")
    inline = "".join(f for f in flags if f in "ismx")
    return f"(?{inline})" if inline else ""


def sparql_regex(c: Column, pattern: str, flags: str | None = None) -> Column:
    """E_Regex with flag translation (i/s/m/x inline, q = quote)."""
    import re as _re

    pat = _re.escape(pattern) if flags and "q" in flags else pattern
    return c.rlike(_flags_prefix(flags) + pat)


def sparql_replace(c: Column, pattern: str, replacement: str,
                   flags: str | None = None) -> Column:
    """E_StrReplace with flag translation."""
    import re as _re

    pat = _re.escape(pattern) if flags and "q" in flags else pattern
    return F.regexp_replace(c, _flags_prefix(flags) + pat, replacement)


# --- term constructors (E_IRI / E_BNode / E_StrDatatype / E_StrLang) --------
# Terms are (kind, val, datatype, lang) structs, matching the triple
# table's column model (terms.TERM_COLS flattened).

def _term(kind, val, datatype=None, lang=None) -> Column:
    k = F.lit(kind) if isinstance(kind, str) else kind
    d = (F.lit(datatype).cast("string")
         if datatype is None or isinstance(datatype, str) else datatype)
    lg = F.lit(lang).cast("string") if lang is None or isinstance(lang, str) else lang
    return F.struct(k.alias("kind"), val.alias("val"),
                    d.alias("datatype"), lg.alias("lang"))


def make_iri(lex: Column, base: str = "") -> Column:
    """E_IRI — resolve a string against an (optional) base IRI.
    Absolute inputs (scheme present) pass through, cf.
    ``expr/E_IRI.java`` + IRIx resolution."""
    absolute = lex.rlike("^[A-Za-z][A-Za-z0-9+.-]*:")
    val = F.when(absolute, lex).otherwise(F.concat(F.lit(base), lex))
    return _term("iri", val)


def make_bnode(label: Column | None = None, scope: Column | None = None) -> Column:
    """E_BNode — fresh blank node per (scope, label); deterministic
    skolem labels (BlankNodeAllocatorHash posture) instead of a mutable
    per-query allocator, so distributed evaluation is reproducible."""
    lab = F.coalesce(label, F.lit("b")) if label is not None else F.lit("b")
    sc = scope if scope is not None else F.lit("expr")
    return _term("bnode", F.concat(F.lit("_:"), F.md5(F.concat_ws(":", sc, lab))))


def make_strdt(lex: Column, datatype) -> Column:
    """E_StrDatatype — typed literal from lexical form + datatype IRI."""
    return _term("literal", lex, datatype)


def make_strlang(lex: Column, lang) -> Column:
    """E_StrLang — language-tagged literal."""
    return _term("literal", lex, None, lang)


def term_str(t: Column) -> Column:
    """E_Str — lexical form of any term."""
    return t.getField("val")


def term_datatype(t: Column) -> Column:
    """E_Datatype: typed literals return their datatype; plain literals
    xsd:string; lang literals rdf:langString (SPARQL 1.1)."""
    return (
        F.when(t.getField("kind") != "literal", F.lit(None).cast("string"))
        .when(t.getField("datatype").isNotNull(), t.getField("datatype"))
        .when(t.getField("lang").isNotNull(),
              F.lit("http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"))
        .otherwise(F.lit("http://www.w3.org/2001/XMLSchema#string"))
    )


def term_lang(t: Column) -> Column:
    """E_Lang — language tag or '' (SPARQL returns empty string)."""
    return F.coalesce(t.getField("lang"), F.lit(""))


def is_iri(t: Column) -> Column:
    return t.getField("kind") == "iri"        # E_IsIRI


def is_blank(t: Column) -> Column:
    return t.getField("kind") == "bnode"      # E_IsBlank


def is_literal(t: Column) -> Column:
    return t.getField("kind") == "literal"    # E_IsLiteral


def is_numeric(t: Column) -> Column:
    """E_IsNumeric — typed numeric literal with a valid lexical form.
    The whole XSD numeric derivation hierarchy counts (ARQ treats
    xsd:int/long/short/nonNegativeInteger/… as numeric, not just the
    four primitive types) — shared constant with the typed shadows."""
    from jena_spark.pipeline.shadows import _NUMERIC_DTS

    return (
        (t.getField("kind") == "literal")
        & t.getField("datatype").isin(_NUMERIC_DTS)
        & t.getField("val").try_cast("double").isNotNull()
    )


def is_triple(t: Column) -> Column:
    """afn:isTriple — RDF-star quoted-triple term test
    (``expr/TestTripleTermFunctions.java:33``; ``Node.java:69``)."""
    return t.getField("kind") == "triple"


def make_triple(s: Column, p: Column, o: Column) -> Column:
    """afn:triple — quoted-triple term from three term structs.
    Predicate must be an IRI and subject non-literal (ARQ raises
    ExprEvalException, ``TestTripleTermFunctions.java:44``; our error
    convention is NULL, like every try_cast-style mapping here)."""
    from jena_spark.queries.rdfstar import quote_col

    lex = quote_col(
        s.getField("kind"), s.getField("val"), p.getField("val"),
        o.getField("kind"), o.getField("val"),
        o.getField("datatype"), o.getField("lang"),
    )
    ok = (p.getField("kind") == "iri") & (s.getField("kind") != "literal")
    return F.when(ok, _term(F.lit("triple"), lex))


def triple_subject(t: Column) -> Column:
    """afn:subject — subject term of a quoted triple (NULL otherwise)."""
    from jena_spark.queries.rdfstar import unquote_cols

    s, _p, _o = unquote_cols(t.getField("val"))
    return F.when(is_triple(t), s)


def triple_predicate(t: Column) -> Column:
    """afn:predicate — predicate (IRI term) of a quoted triple."""
    from jena_spark.queries.rdfstar import unquote_cols

    _s, p, _o = unquote_cols(t.getField("val"))
    return F.when(is_triple(t), _term("iri", p))


def triple_object(t: Column) -> Column:
    """afn:object — object term of a quoted triple."""
    from jena_spark.queries.rdfstar import unquote_cols

    _s, _p, o = unquote_cols(t.getField("val"))
    return F.when(is_triple(t), o)


def sha224_udf():
    """E_SHA224 has no Spark builtin — Arrow-batched fallback."""
    import hashlib

    @F.pandas_udf("string")
    def _sha224(s: pd.Series) -> pd.Series:
        return s.map(lambda x: hashlib.sha224(x.encode()).hexdigest() if x is not None else None)

    return _sha224


# E_ class -> builder. Positional Column args; semantics caveats inline.
SPARQL_FUNCTIONS: dict[str, Callable[..., Column]] = {
    # strings
    "strlen": F.length,                       # E_StrLength
    "substr": sparql_substr,                  # E_StrSubstring (1-based both)
    "ucase": F.upper,                         # E_StrUpperCase
    "lcase": F.lower,                         # E_StrLowerCase
    "concat": F.concat,                       # E_StrConcat
    "contains": lambda a, b: a.contains(b),   # E_StrContains
    "strstarts": lambda a, b: a.startswith(b),  # E_StrStartsWith
    "strends": lambda a, b: a.endswith(b),    # E_StrEndsWith
    "strbefore": str_before,                  # E_StrBefore
    "strafter": str_after,                    # E_StrAfter
    "replace": sparql_replace,                # E_StrReplace (flags i/s/m/x/q)
    "regex": sparql_regex,                    # E_Regex (flags i/s/m/x/q)
    "encode_for_uri": F.url_encode,           # E_StrEncodeForURI
    # numerics (SPARQL divide on decimals stays decimal — caller casts)
    "abs": F.abs,                             # E_NumAbs
    "ceil": F.ceil,                           # E_NumCeiling
    "floor": F.floor,                         # E_NumFloor
    "round": lambda c: F.round(c, 0),         # E_NumRound (half-up; Jena rounds half-up too)
    "rand": F.rand,                           # E_Random (nondeterministic!)
    # date/time
    "year": F.year, "month": F.month, "day": F.dayofmonth,  # E_DateTime*
    "hours": F.hour, "minutes": F.minute, "seconds": F.second,
    "now": F.current_timestamp,               # E_Now
    "tz": lambda c: F.date_format(c, "xxx"),  # E_DateTimeTZ
    # hashing
    "md5": F.md5,                             # E_MD5
    "sha1": F.sha1,                           # E_SHA1
    "sha256": lambda c: F.sha2(c, 256),       # E_SHA256
    "sha384": lambda c: F.sha2(c, 384),       # E_SHA384
    "sha512": lambda c: F.sha2(c, 512),       # E_SHA512
    # logical / conditional
    "if": sparql_if,                          # E_Conditional
    "coalesce": F.coalesce,                   # E_Coalesce
    "in": lambda c, *vals: c.isin(*vals),     # E_OneOf
    "bound": lambda c: c.isNotNull(),         # E_Bound
    "sameterm": lambda a, b: a.eqNullSafe(b),  # E_SameTerm
    "langmatches": lambda lang, rng: F.when(
        F.lit(rng) == "*", lang.isNotNull() & (lang != "")
    ).otherwise(F.lower(lang).startswith(F.lower(F.lit(rng)))),  # E_LangMatches
    # term constructors & accessors (term = (kind,val,datatype,lang) struct)
    "iri": make_iri,                          # E_IRI
    "bnode": make_bnode,                      # E_BNode
    "strdt": make_strdt,                      # E_StrDatatype
    "strlang": make_strlang,                  # E_StrLang
    "str": term_str,                          # E_Str
    "datatype": term_datatype,                # E_Datatype
    "lang": term_lang,                        # E_Lang
    "isiri": is_iri,                          # E_IsIRI
    "isblank": is_blank,                      # E_IsBlank
    "isliteral": is_literal,                  # E_IsLiteral
    "isnumeric": is_numeric,                  # E_IsNumeric
    # constructors / casts honor XSD lexical rules; try_cast so a
    # malformed lexical yields NULL (ARQ's CastXSD raises a per-row
    # expression error; NULL is this engine's error value) instead of
    # aborting the whole query under Spark 4 ANSI mode
    "xsd_integer": lambda c: c.try_cast("long"),
    "xsd_decimal": lambda c: c.try_cast("decimal(38,18)"),
    "xsd_double": lambda c: c.try_cast("double"),
    "xsd_float": lambda c: c.try_cast("float"),
    "xsd_boolean": lambda c: c.try_cast("boolean"),
    "xsd_string": lambda c: c.cast("string"),  # total — every lexical casts
    "xsd_datetime": lambda c: c.try_cast("timestamp"),
}

# the same casting constructors by full IRI — ARQ dispatches
# ``xsd:double(expr)`` through the function registry (``E_Function``
# + ``CastXSD``); reachable from SPARQL strings via the IRI-call
# syntax. Aliases of the xsd_* entries — one definition per cast.
_XSD_NS = "http://www.w3.org/2001/XMLSchema#"
SPARQL_FUNCTIONS.update({
    _XSD_NS + local: SPARQL_FUNCTIONS["xsd_" + key]
    for local, key in (
        ("integer", "integer"), ("decimal", "decimal"),
        ("double", "double"), ("float", "float"),
        ("boolean", "boolean"), ("string", "string"),
        ("dateTime", "datetime"),
    )
})


def datetime_timezone(lex: Column) -> Column:
    """E_DateTimeTimezone — the xsd:dateTime literal's OWN timezone as
    an xsd:dayTimeDuration lexical form ("PT0S", "PT5H30M", "-PT8H").

    SPARQL TIMEZONE() is defined on the dateTime VALUE's zone, so the
    offset is parsed from the stored lexical form (suffix ``Z`` /
    ``±hh:mm``), never from a session-zone rendering of the timestamp
    (which would collapse every input to the session offset). Zoneless
    datetimes yield NULL — ARQ raises an expression error there, and
    NULL is this engine's error value (same policy as try_cast)."""
    off = F.regexp_extract(lex, r"(Z|[+-]\d{2}:\d{2})$", 1)
    sign = F.when(off.startswith("-"), F.lit("-")).otherwise(F.lit(""))
    hh = F.substring(off, 2, 2).try_cast("int")
    mm = F.substring(off, 5, 2).try_cast("int")
    return (
        F.when(off == "", F.lit(None).cast("string"))
        .when((off == "Z") | ((hh == 0) & (mm == 0)), F.lit("PT0S"))
        .otherwise(
            F.concat(
                sign, F.lit("PT"), hh.cast("string"), F.lit("H"),
                F.when(mm > 0, F.concat(mm.cast("string"), F.lit("M")))
                .otherwise(F.lit("")),
            )
        )
    )


def call(name: str, *args) -> Column:
    """E_Call / E_FunctionDynamic — dynamic dispatch through the
    registry (the function IRI/name is data-independent here; a
    data-dependent name would need a CASE over the registry, which
    ARQ's E_Call also effectively builds)."""
    if name not in SPARQL_FUNCTIONS:
        raise KeyError(f"unregistered function: {name!r}")
    return SPARQL_FUNCTIONS[name](*args)


# E_* operator families expressible directly as Column operators —
# registered so the dynamic-call surface (E_Call) covers them too.
SPARQL_FUNCTIONS.update({
    # arithmetic (E_Add/E_Subtract/E_Multiply/E_Divide/E_UnaryMinus/E_UnaryPlus)
    "add": lambda a, b: a + b,
    "subtract": lambda a, b: a - b,
    "multiply": lambda a, b: a * b,
    # E_Divide: division by zero is a SPARQL expression ERROR
    # (ExprEvalException -> unbound/row filtered), NOT a query abort —
    # Spark 4 ANSI `/` throws DIVIDE_BY_ZERO mid-query, so the mapping
    # must be try_divide (NULL on zero, the engine's error-as-NULL
    # convention; same posture as try_cast in the value-space parsers)
    "divide": lambda a, b: F.try_divide(a, b),
    "unary_minus": lambda a: -a,
    "unary_plus": lambda a: a,
    # comparisons (E_Equals .. E_LessThanOrEqual; term order is the
    # SPARQL value-comparison on the typed shadow columns)
    "eq": lambda a, b: a == b,
    "ne": lambda a, b: a != b,
    "gt": lambda a, b: a > b,
    "ge": lambda a, b: a >= b,
    "lt": lambda a, b: a < b,
    "le": lambda a, b: a <= b,
    # logical (E_LogicalAnd/Or/Not — SPARQL 3-valued logic matches
    # Spark's null-propagating boolean operators)
    "and": lambda a, b: a & b,
    "or": lambda a, b: a | b,
    "not": lambda a: ~a,
    "not_in": lambda c, *vals: ~c.isin(*vals),   # E_NotOneOf
    # aliases / constructors
    "isuri": is_iri,                       # E_IsURI (synonym of IsIRI)
    "uri": make_iri,                       # E_URI (synonym of IRI)
    "cast": lambda c, t: c.try_cast(t),    # E_Cast (NULL on invalid lexical)
    "timezone": datetime_timezone,         # E_DateTimeTimezone
    # nondeterministic (like E_Random: excluded from deterministic
    # pipeline paths by the CLAUDE.md invariant; provided for parity)
    "uuid": lambda: F.expr("concat('urn:uuid:', uuid())"),   # E_UUID
    "struuid": lambda: F.expr("uuid()"),                      # E_StrUUID
    "version": lambda: F.lit("jena-spark/0.2"),               # E_Version
    "call": call,                                             # E_Call
    # RDF-star triple-term functions (afn:, TestTripleTermFunctions.java)
    "triple": make_triple,
    "subject": triple_subject,
    "predicate": triple_predicate,
    "object": triple_object,
    "istriple": is_triple,
})
# Coverage note: of the 77 E_* classes, the only ones without a mapping
# are E_Exists/E_NotExists (algebra-level — queries/algebra.py
# exists/not_exists) and E_Function/E_FunctionDynamic beyond `call`
# (covered by this registry itself).


def register(name: str, fn: Callable[..., Column]) -> None:
    """Custom function registration (FunctionRegistry.put analog)."""
    SPARQL_FUNCTIONS[name] = fn


# --- IRI-dispatched standard library namespaces ------------------------------
# ARQ registers the XPath fn:/math: namespaces and its own afn: library
# in the FunctionRegistry by FULL IRI (``sparql/function/StandardFunctions
# .java``, ``function/library/`` — FN_*.java, Math_*.java, localname.java,
# sha1sum.java, strjoin.java, ...), reachable from query strings as
# ``fn:lower-case(?x)`` / ``math:pow(?x, 2)`` / ``afn:localname(?i)``.
# Deterministic members only: afn:now / afn:execTime / afn:bnode violate
# this engine's no-clock/no-rand pipeline policy and stay unregistered.

_FN = "http://www.w3.org/2005/xpath-functions#"
_MATH = "http://www.w3.org/2005/xpath-functions/math#"
_AFN = "http://jena.apache.org/ARQ/function#"

SPARQL_FUNCTIONS.update({
    # fn: — aliases of the E_* string/numeric mappings (FN_*.java)
    _FN + "lower-case": SPARQL_FUNCTIONS["lcase"],
    _FN + "upper-case": SPARQL_FUNCTIONS["ucase"],
    _FN + "string-length": SPARQL_FUNCTIONS["strlen"],
    _FN + "concat": SPARQL_FUNCTIONS["concat"],
    _FN + "contains": SPARQL_FUNCTIONS["contains"],
    _FN + "starts-with": SPARQL_FUNCTIONS["strstarts"],
    _FN + "ends-with": SPARQL_FUNCTIONS["strends"],
    _FN + "substring-before": SPARQL_FUNCTIONS["strbefore"],
    _FN + "substring-after": SPARQL_FUNCTIONS["strafter"],
    _FN + "encode-for-uri": SPARQL_FUNCTIONS["encode_for_uri"],
    _FN + "matches": SPARQL_FUNCTIONS["regex"],
    _FN + "replace": SPARQL_FUNCTIONS["replace"],
    _FN + "abs": SPARQL_FUNCTIONS["abs"],
    _FN + "ceiling": SPARQL_FUNCTIONS["ceil"],
    _FN + "floor": SPARQL_FUNCTIONS["floor"],
    _FN + "round": SPARQL_FUNCTIONS["round"],
    _FN + "not": lambda c: ~c.try_cast("boolean"),      # FN_Not (NULL on
    # non-boolean lexicals — the engine's error value; plain cast
    # aborts the query under ANSI mode)
    _FN + "normalize-space": lambda c: F.trim(
        F.regexp_replace(c, r"\s+", " ")),              # FN_StrNormalizeSpace
    # math: (Math_*.java) — JVM column math, no UDFs
    _MATH + "pow": lambda a, b: F.pow(a, b),
    _MATH + "sqrt": F.sqrt,
    _MATH + "exp": F.exp,
    _MATH + "exp10": lambda c: F.pow(F.lit(10.0), c),
    _MATH + "log": F.log,                               # natural log
    _MATH + "log10": F.log10,
    _MATH + "atan2": lambda a, b: F.atan2(a, b),
    _MATH + "pi": lambda: F.lit(3.141592653589793),
    # afn: (function/library/) — deterministic members
    _AFN + "localname": lambda c: F.regexp_extract(c, r"([^#/]*)$", 1),
    _AFN + "namespace": lambda c: F.regexp_extract(c, r"^(.*[#/])", 1),
    _AFN + "sha1sum": F.sha1,
    _AFN + "min": F.least,
    _AFN + "max": F.greatest,
    _AFN + "pi": lambda: F.lit(3.141592653589793),
    _AFN + "e": lambda: F.lit(2.718281828459045),
    _AFN + "sqrt": F.sqrt,
})


def _strjoin(sep: Column, *parts: Column) -> Column:
    """afn:strjoin (``strjoin.java``): first argument is the separator
    — interleave explicitly (concat_ws needs a literal separator
    string, but ARQ accepts any expression)."""
    out = [parts[0]] if parts else []
    for p in parts[1:]:
        out.extend([sep, p])
    return F.concat(*out) if out else F.lit("")


SPARQL_FUNCTIONS[_AFN + "strjoin"] = _strjoin
