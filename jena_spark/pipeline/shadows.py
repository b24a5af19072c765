"""Typed shadow columns for value-space operations (SURVEY §1.6).

Jena evaluates expressions on typed ``NodeValue``s with XSD numeric
promotion (``jena-arq/.../sparql/expr/NodeValue.java:60``); TDB inlines
small typed values directly into the 64-bit NodeId
(``jena-tdb/.../store/NodeId.java:115-152``) so numeric comparisons
never touch strings. The Spark analog: keep the lexical form
authoritative (term identity) and add *shadow* columns — ``o_num``
(decimal(38,18)) and ``o_ts`` (timestamp) — populated only where the
datatype is numeric/temporal. Filters and aggregates over values use
the shadows (JVM-typed comparisons, min/max pruning on parquet); term
equality still uses the lexical columns.

``xsd:integer`` is unbounded (``XSDDatatype.java:87``) — values beyond
decimal(38) keep a NULL shadow (lexical stays correct); callers that
need exactness on such outliers fall back to the lexical column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jena_spark import terms as TM

_NUMERIC_DTS = [
    TM.XSD + n for n in (
        "integer", "decimal", "double", "float", "int", "long", "short",
        "byte", "nonNegativeInteger", "positiveInteger", "unsignedInt",
        "unsignedLong",
    )
]


# --- custom datatype registry (TypeMapper analog) ---------------------------
# Reference: ``jena-core/.../datatypes/TypeMapper.java:40`` — user
# datatypes register a URI plus lexical->value parsing; literals of
# that datatype then participate in value-space operations. Spark
# analog: a registered datatype contributes a Column expression mapping
# the lexical o_val to the ``o_num`` shadow (NULL = invalid lexical
# form, mirroring DatatypeFormatException semantics without killing the
# job).

_CUSTOM_NUMERIC: dict[str, object] = {}


def register_datatype(datatype_iri: str, to_num) -> None:
    """Register a custom datatype: ``to_num(o_val_col) -> Column`` must
    yield a decimal(38,18)-castable value (use try_cast for partial
    lexical spaces). Registered types feed the ``o_num`` shadow exactly
    like built-in XSD numerics."""
    _CUSTOM_NUMERIC[datatype_iri] = to_num


def registered_datatypes() -> list[str]:
    return sorted(_CUSTOM_NUMERIC)


# --- temporal value space beyond dateTime ------------------------------------
# Reference: ``jena-core/.../datatypes/xsd/XSDDatatype.java:174-195``
# registers duration / the Gregorian types; ``NodeValue.java`` promotes
# them for value-space FILTER comparison. Here every Gregorian lexical
# maps onto the SAME ``o_ts`` timestamp shadow via reference instants
# (gYear -> Jan 1, gYearMonth -> day 1, gMonthDay/gMonth/gDay anchor in
# the LEAP year 2000 so ``--02-29`` is representable; time anchors at
# epoch day), and durations split into the XPath comparison dimensions:
# ``o_dur_months`` (yearMonth part, total months) and ``o_dur_secs``
# (dayTime part, total seconds) — yearMonthDuration compares by months,
# dayTimeDuration by seconds, exactly the two total orders XPath/ARQ
# define (mixed-dimension comparison is indeterminate in Jena; here
# each dimension is its own column so the caller states which order
# they mean). UTC 'Z' suffixes are stripped; explicit ±hh:mm offsets
# are out of profile (NULL shadow — lexical stays authoritative).

#: Gregorian datatype -> (regex stripping to a castable instant)
#: applied AFTER the Z-strip; '' = value used as-is with the suffix.
_GREGORIAN = {
    TM.XSD + "date": ("$", ""),                     # 2024-03-05
    TM.XSD + "gYear": ("$", "-01-01"),              # 2024
    TM.XSD + "gYearMonth": ("$", "-01"),            # 2024-03
    TM.XSD + "gMonthDay": ("^--", "2000-"),         # --03-05 -> 2000-03-05
    TM.XSD + "gMonth": ("^--(\\d{2})$", "2000-$1-01"),   # --03
    TM.XSD + "gDay": ("^---(\\d{2})$", "2000-01-$1"),    # ---05
    TM.XSD + "time": ("^", "1970-01-01 "),          # 13:45:06
}

#: anchored duration lexical check (RE2-compatible — no lookaheads —
#: so DuckDB oracles can evaluate the IDENTICAL expression). Accepts
#: the degenerate 'P'/'PnYT' forms Jena rejects; fields absent = 0.
DURATION_RE = (r"^-?P([0-9]+Y)?([0-9]+M)?([0-9]+D)?"
               r"(T([0-9]+H)?([0-9]+M)?([0-9]+(\.[0-9]+)?S)?)?$")

_DURATION_DTS = [TM.XSD + n for n in
                 ("duration", "yearMonthDuration", "dayTimeDuration")]


def _dur_field(col, pattern: str):
    x = F.regexp_extract(col, pattern, 1).try_cast("decimal(38,18)")
    return F.coalesce(x, F.lit(0).cast("decimal(38,18)"))


def duration_months(col) -> "F.Column":
    """Duration lexical -> yearMonth part in total months (NULL when
    the lexical is not a duration)."""
    sign = F.when(col.startswith("-"), F.lit(-1)).otherwise(F.lit(1))
    months = _dur_field(col, r"([0-9]+)Y") * 12 \
        + _dur_field(col, r"P[^T]*?([0-9]+)M")
    return F.when(col.rlike(DURATION_RE) & col.rlike("[0-9]"),
                  (sign * months).cast("long"))


def duration_seconds(col) -> "F.Column":
    """Duration lexical -> dayTime part in total seconds (NULL when
    the lexical is not a duration)."""
    sign = F.when(col.startswith("-"), F.lit(-1)).otherwise(F.lit(1))
    secs = _dur_field(col, r"([0-9]+)D") * 86400 \
        + _dur_field(col, r"([0-9]+)H") * 3600 \
        + _dur_field(col, r"T(?:[0-9]+H)?([0-9]+)M") * 60 \
        + _dur_field(col, r"([0-9]+(?:\.[0-9]+)?)S")
    return F.when(col.rlike(DURATION_RE) & col.rlike("[0-9]"),
                  (sign * secs).cast("decimal(38,18)"))


def with_typed_shadows(triples: DataFrame) -> DataFrame:
    num = F.when(
        F.col("o_datatype").isin(_NUMERIC_DTS),
        F.col("o_val").try_cast("decimal(38,18)"),
    )
    for dt_iri, to_num in _CUSTOM_NUMERIC.items():
        num = num.when(
            F.col("o_datatype") == dt_iri,
            to_num(F.col("o_val")).try_cast("decimal(38,18)"),
        )
    nz = F.regexp_replace("o_val", "Z$", "")
    ts = F.when(F.col("o_datatype") == TM.XSD_DATETIME,
                nz.try_cast("timestamp"))
    for dt_iri, (pat, repl) in _GREGORIAN.items():
        ts = ts.when(F.col("o_datatype") == dt_iri,
                     F.regexp_replace(nz, pat, repl).try_cast("timestamp"))
    is_dur = F.col("o_datatype").isin(_DURATION_DTS)
    return (
        triples.withColumn("o_num", num).withColumn("o_ts", ts)
        .withColumn("o_dur_months",
                    F.when(is_dur, duration_months(F.col("o_val"))))
        .withColumn("o_dur_secs",
                    F.when(is_dur, duration_seconds(F.col("o_val"))))
    )
