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
    "replace": F.regexp_replace,              # E_StrReplace (regex; flags TODO)
    "regex": lambda c, pat: c.rlike(pat),     # E_Regex
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
    # constructors / casts honor XSD lexical rules via Spark cast
    "xsd_integer": lambda c: c.cast("long"),
    "xsd_decimal": lambda c: c.cast("decimal(38,18)"),
    "xsd_double": lambda c: c.cast("double"),
    "xsd_boolean": lambda c: c.cast("boolean"),
    "xsd_string": lambda c: c.cast("string"),
    "xsd_datetime": lambda c: c.cast("timestamp"),
}


def register(name: str, fn: Callable[..., Column]) -> None:
    """Custom function registration (FunctionRegistry.put analog)."""
    SPARQL_FUNCTIONS[name] = fn
