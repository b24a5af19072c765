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
    ts = F.when(
        F.col("o_datatype") == TM.XSD_DATETIME,
        F.regexp_replace("o_val", "Z$", "").try_cast("timestamp"),
    )
    return triples.withColumn("o_num", num).withColumn("o_ts", ts)
