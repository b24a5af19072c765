"""IRI checking (jena-iri parity) — distributed IRIFactory / Violation
analog.

Reference: ``jena-iri/src/main/java/org/apache/jena/iri/IRIFactory.java``
(check entry points), ``Violation.java`` (code + isError), and the
violation catalogue ``ViolationCodes.java:5606-7622``. RIOT's IRI
checker surfaces exactly this machinery per parsed IRI
(``jena-arq/.../riot/checker/CheckerIRI.java``).

Scope: the RFC 3986/3987 syntax-level subset of the catalogue — the
codes a checker can decide from the IRI string alone (character
classes, scheme shape, percent encoding, authority/port hygiene, dot
segments). Registry/IDN/Unicode-normalization codes (NOT_NFC, BAD_IDN,
UNREGISTERED_IANA_SCHEME, ...) need tables the reference ships as
generated data and are out of scope — documented, not silently
skipped.

Every check is one JVM regex/predicate (whole-stage codegen, no
Python), deliberately written WITHOUT lookahead so the DuckDB oracle
(RE2) can run the identical patterns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: (code, regex-or-None, is_error) in ViolationCodes.java order.
#: ``None`` patterns are composite checks built in ``_checks``.
_SCHEME = r"^[A-Za-z][A-Za-z0-9+.\-]*"
_AUTH = _SCHEME + r"://"

CHECKS: list[tuple[str, str | None, bool]] = [
    # ILLEGAL_CHARACTER (code 0): gen-delims that may never appear raw
    ("ILLEGAL_CHARACTER", r'[<>"]', True),
    # PERCENT_ENCODING_SHOULD_BE_UPPERCASE (1)
    (
        "PERCENT_ENCODING_SHOULD_BE_UPPERCASE",
        r"%[0-9A-Fa-f][a-f]|%[a-f][0-9A-Fa-f]",
        False,
    ),
    # UNWISE_CHARACTER (4) — RFC 2396 unwise set; '[' ']' excluded
    # here because they are legal IPv6-host delimiters (documented
    # narrowing, the reference consults position)
    ("UNWISE_CHARACTER", r"[{}|\\^`]", False),
    # CONTROL_CHARACTER (5)
    ("CONTROL_CHARACTER", r"[\x00-\x1f\x7f]", True),
    # NON_INITIAL_DOT_SEGMENT (8): '.' / '..' segments inside a path
    ("NON_INITIAL_DOT_SEGMENT", r"://[^/?#]*/([^?#]*/)?\.\.?(/|\?|#|$)", False),
    # EMPTY_SCHEME (9)
    ("EMPTY_SCHEME", r"^:", True),
    # SCHEME_MUST_START_WITH_LETTER (10) — composite
    ("SCHEME_MUST_START_WITH_LETTER", None, True),
    # LOWERCASE_PREFERRED (11) — composite (uppercase in scheme)
    ("LOWERCASE_PREFERRED", None, False),
    # PORT_SHOULD_NOT_BE_EMPTY (12)
    ("PORT_SHOULD_NOT_BE_EMPTY", _AUTH + r"[^/?#]*:(/|\?|#|$)", False),
    # DEFAULT_PORT_SHOULD_BE_OMITTED (13) — composite (http:80/https:443)
    ("DEFAULT_PORT_SHOULD_BE_OMITTED", None, False),
    # PORT_SHOULD_NOT_BE_WELL_KNOWN (14) — composite (1..1023)
    ("PORT_SHOULD_NOT_BE_WELL_KNOWN", None, False),
    # PORT_SHOULD_NOT_START_IN_ZERO (15)
    ("PORT_SHOULD_NOT_START_IN_ZERO", _AUTH + r"[^/?#:]*:0[0-9]*([/?#]|$)", False),
    # WHITESPACE (17)
    ("WHITESPACE", r"\s", True),
    # ILLEGAL_PERCENT_ENCODING (30): '%' not followed by two hex digits
    # (lookahead-free: % then a non-hex/end, or % then hex then
    # non-hex/end)
    (
        "ILLEGAL_PERCENT_ENCODING",
        r"%($|[^0-9A-Fa-f])|%[0-9A-Fa-f]($|[^0-9A-Fa-f])",
        True,
    ),
    # HAS_PASSWORD (36)
    ("HAS_PASSWORD", _AUTH + r"[^/?#@]*:[^/?#@]*@", False),
    # REQUIRED_COMPONENT_MISSING (57) — composite (no scheme where an
    # absolute IRI is required)
    ("REQUIRED_COMPONENT_MISSING", None, True),
]

#: port captured only for plain (non-IPv6-bracket) hosts
_PORT_PAT = _AUTH + r"[^/?#:\[\]]*:([0-9]+)([/?#]|$)"


def _checks(c: Column, require_absolute: bool) -> list[tuple[str, Column, bool]]:
    has_scheme = c.rlike(r"^[^:/?#]+:")
    scheme = F.regexp_extract(c, r"^([^:/?#]*):", 1)
    port = F.regexp_extract(c, _PORT_PAT, 1)
    port_n = F.nullif(port, F.lit("")).try_cast("int")
    out = []
    for code, pat, is_err in CHECKS:
        if pat is not None:
            cond = c.rlike(pat)
        elif code == "SCHEME_MUST_START_WITH_LETTER":
            cond = has_scheme & ~scheme.rlike(r"^[A-Za-z]")
        elif code == "LOWERCASE_PREFERRED":
            cond = has_scheme & scheme.rlike(r"[A-Z]")
        elif code == "DEFAULT_PORT_SHOULD_BE_OMITTED":
            cond = ((F.lower(scheme) == "http") & (port_n == 80)) | (
                (F.lower(scheme) == "https") & (port_n == 443)
            )
        elif code == "PORT_SHOULD_NOT_BE_WELL_KNOWN":
            cond = port_n.isNotNull() & (port_n >= 1) & (port_n <= 1023)
        elif code == "REQUIRED_COMPONENT_MISSING":
            if not require_absolute:
                continue
            cond = ~has_scheme
        else:  # pragma: no cover
            raise AssertionError(code)
        out.append((code, cond, is_err))
    return out


def iri_violations(
    df: DataFrame, col: str = "iri", require_absolute: bool = True
) -> DataFrame:
    """IRIFactory.create(...).violations(...) analog, set-at-a-time:
    one row per (iri, violation). All checks evaluate in a single
    projection — an array of (code, is_error) structs filtered by the
    per-check condition, then exploded — so the input scans once."""
    c = F.col(col)
    structs = [
        F.when(cond, F.struct(F.lit(code).alias("code"), F.lit(err).alias("is_error")))
        for code, cond, err in _checks(c, require_absolute)
    ]
    arr = F.filter(F.array(*structs), lambda x: x.isNotNull())
    return (
        df.select(c.alias("iri"), F.explode(arr).alias("v"))
        .select("iri", F.col("v.code").alias("code"), F.col("v.is_error").alias("is_error"))
    )


def has_violation(df: DataFrame, col: str = "iri", include_warnings: bool = False) -> DataFrame:
    """IRI.hasViolation(includeWarnings) analog: the input rows whose
    IRI carries at least one violation."""
    c = F.col(col)
    conds = [
        cond if include_warnings else (cond & F.lit(err))
        for _, cond, err in _checks(c, require_absolute=True)
    ]
    flag = conds[0]
    for x in conds[1:]:
        flag = flag | x
    return df.where(flag)


def check_triples(triples: DataFrame) -> DataFrame:
    """RIOT CheckerIRI posture: validate every IRI-kind term position
    of a triple frame; returns (iri, code, is_error) distinct."""
    iris = (
        triples.where(F.col("s_kind") == "iri").select(F.col("s_val").alias("iri"))
        .unionByName(triples.select(F.col("p_val").alias("iri")))
        .unionByName(
            triples.where(F.col("o_kind") == "iri").select(F.col("o_val").alias("iri"))
        )
        .distinct()
    )
    return iri_violations(iris)


_SQL_SCHEME = "regexp_extract(iri, '^([^:/?#]*):', 1)"
_SQL_HAS_SCHEME = "regexp_matches(iri, '^[^:/?#]+:')"
_SQL_PORT = (
    "TRY_CAST(NULLIF(regexp_extract(iri, '" + _PORT_PAT + "', 1), '') AS INT)"
)


def oracle_conditions() -> list[tuple[str, str, bool]]:
    """The SAME checks as ``_checks`` rendered as DuckDB SQL booleans
    (RE2 — which is why every pattern above is lookahead-free). Keeps
    the oracle rule-for-rule in lock-step with the distributed path by
    construction."""
    out = []
    for code, pat, is_err in CHECKS:
        if pat is not None:
            cond = f"regexp_matches(iri, '{pat}')"
        elif code == "SCHEME_MUST_START_WITH_LETTER":
            cond = (
                f"{_SQL_HAS_SCHEME} AND NOT regexp_matches({_SQL_SCHEME}, '^[A-Za-z]')"
            )
        elif code == "LOWERCASE_PREFERRED":
            cond = f"{_SQL_HAS_SCHEME} AND regexp_matches({_SQL_SCHEME}, '[A-Z]')"
        elif code == "DEFAULT_PORT_SHOULD_BE_OMITTED":
            cond = (
                f"(lower({_SQL_SCHEME}) = 'http' AND {_SQL_PORT} = 80)"
                f" OR (lower({_SQL_SCHEME}) = 'https' AND {_SQL_PORT} = 443)"
            )
        elif code == "PORT_SHOULD_NOT_BE_WELL_KNOWN":
            cond = f"{_SQL_PORT} BETWEEN 1 AND 1023"
        elif code == "REQUIRED_COMPONENT_MISSING":
            cond = f"NOT {_SQL_HAS_SCHEME}"
        else:  # pragma: no cover
            raise AssertionError(code)
        out.append((code, cond, is_err))
    return out


#: deterministic malformed-IRI battery for tests and the registry
#: oracle — one exemplar per implemented code (strings chosen so each
#: trips ONLY its own check, except where the catalogue genuinely
#: overlaps).
TEST_BATTERY: list[str] = [
    "http://ex.org/ok",                      # clean
    "http://ex.org/<bad>",                   # ILLEGAL_CHARACTER
    "http://ex.org/a%2fb",                   # PERCENT_ENCODING_SHOULD_BE_UPPERCASE
    "http://ex.org/a{b}",                    # UNWISE_CHARACTER
    "http://ex.org/a\tb",                    # CONTROL_CHARACTER + WHITESPACE
    "http://ex.org/a/./b",                   # NON_INITIAL_DOT_SEGMENT
    "http://ex.org/a/../b",                  # NON_INITIAL_DOT_SEGMENT
    ":no-scheme",                            # EMPTY_SCHEME
    "1http://ex.org/x",                      # SCHEME_MUST_START_WITH_LETTER
    "HTTP://ex.org/x",                       # LOWERCASE_PREFERRED
    "http://ex.org:/x",                      # PORT_SHOULD_NOT_BE_EMPTY
    "http://ex.org:80/x",                    # DEFAULT_PORT_SHOULD_BE_OMITTED + well-known
    "http://ex.org:443/x",                   # PORT_SHOULD_NOT_BE_WELL_KNOWN
    "http://ex.org:0808/x",                  # PORT_SHOULD_NOT_START_IN_ZERO
    "http://ex.org/a b",                     # WHITESPACE
    "http://ex.org/100%",                    # ILLEGAL_PERCENT_ENCODING
    "http://ex.org/a%2",                     # ILLEGAL_PERCENT_ENCODING
    "http://user:pw@ex.org/x",               # HAS_PASSWORD
    "relative/path",                         # REQUIRED_COMPONENT_MISSING
]
