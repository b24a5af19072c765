"""Relational table → RDF graph (direct mapping).

The reference ships two relational↔RDF bridges: ``jena-sdb`` (an RDF
store laid out IN SQL tables — ``jena-sdb/.../sdb/SDBFactory.java``,
``store/StoreTriplesNodes*``) and the jena-csv PropertyTable view
(``jena-csv``; see :mod:`jena_spark.sources.csvpt`), where a tabular
row becomes one subject and each column a predicate. What a *user of
the reference* actually does with relational data is expose it as a
graph and query it with SPARQL; the published, tool-neutral contract
for that is the W3C **Direct Mapping of Relational Data to RDF**
(W3C Recommendation, 2012). This module implements that mapping over
any Spark DataFrame — which is exactly the PropertyTable posture
generalised from CSV files to arbitrary relational sources (parquet,
JDBC, Iceberg) with keys and foreign keys.

Mapping (per the Recommendation, restricted to the profile below):

* row node — ``<base><table>/<key-col>=<key-val>`` for a keyed table
  (composite keys join the ``col=val`` pairs with ``;``); a table
  without a declared key gets one *blank node* per row, labelled by a
  content hash of the full row (deterministic — the pipeline policy —
  where the spec leaves bnode allocation open);
* class triple — every row node is ``rdf:type <base><table>``;
* literal triple — ``<row> <base><table>#<col> "<value>"^^xsd:...``
  for every non-NULL cell, datatype from the column's Spark type
  (integers → ``xsd:integer``, float/double → ``xsd:double``,
  decimal → ``xsd:decimal``, boolean → ``xsd:boolean``, date →
  ``xsd:date``, timestamp → ``xsd:dateTime`` in the canonical UTC
  form, strings → plain literals per FIXTURES.md §2);
* reference triple — for a declared foreign key,
  ``<row> <base><table>#ref-<col> <target row node>``; the FK column's
  literal triple is ALSO emitted (the spec keeps both).

Restrictions (documented, not silent): key and FK values are used
verbatim in IRIs — the caller must pre-encode values that are not
IRI-safe (the spec percent-encodes; this engine's relational keys are
numeric/identifier-shaped, and a distributed percent-encoder for
arbitrary cell bytes is not worth the per-row cost until a corpus
needs it). Keyless tables get CONTENT-ADDRESSED blank nodes, so fully
duplicate rows collapse to one node — the deterministic analog of the
spec's fresh-bnode-per-row, which has no order-free distributed
equivalent (graph semantics make the collapsed form
indistinguishable to every SPARQL query except a bnode census).

Distributed posture: ONE scan of the source table — every cell's
candidate triple is built as a struct inside a single ``explode``
(JVM, whole-stage codegen), then NULL cells are filtered. No shuffle,
no Python, no per-column re-scan; column pruning still applies
upstream of the explode when the caller selects a column subset
first. At 100 TB a direct-mapped fact table is a map-only job.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from jena_spark import terms as TM

#: default IRI base for direct-mapped tables.
DEFAULT_BASE = TM.NS + "rdb/"

_RDF_TYPE = TM.RDF_TYPE


def _literal_of(col: Column, dtype: T.DataType) -> tuple[Column, Column]:
    """(lexical, datatype-IRI) for one cell per the type map above.
    Canonical lexical forms so term equality == value equality
    (``LiteralLabelImpl.java:397-407`` posture, terms.py)."""
    if isinstance(dtype, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return col.cast("string"), F.lit(TM.XSD_INTEGER)
    if isinstance(dtype, (T.FloatType, T.DoubleType)):
        return col.cast("double").cast("string"), F.lit(TM.XSD + "double")
    if isinstance(dtype, T.DecimalType):
        return col.cast("string"), F.lit(TM.XSD_DECIMAL)
    if isinstance(dtype, T.BooleanType):
        return col.cast("string"), F.lit(TM.XSD_BOOLEAN)
    if isinstance(dtype, T.DateType):
        return col.cast("string"), F.lit(TM.XSD + "date")
    if isinstance(dtype, T.TimestampType):
        return TM.canon_datetime_col(col), F.lit(TM.XSD_DATETIME)
    # strings (and anything lexically-stringable) → plain literal
    return col.cast("string"), F.lit(None).cast("string")


def row_node(table: str, key_cols: list[str], base: str = DEFAULT_BASE) -> Column:
    """The row-node IRI expression ``<base>table/k1=v1;k2=v2``."""
    parts: list[Column] = []
    for k in key_cols:
        parts.append(F.concat(F.lit(k + "="), F.col(k).cast("string")))
    joined = parts[0] if len(parts) == 1 else F.concat_ws(";", *parts)
    return F.concat(F.lit(base + table + "/"), joined)


def direct_map(
    df: DataFrame,
    table: str,
    key: str | list[str] | None = None,
    refs: dict[str, tuple[str, str]] | None = None,
    base: str = DEFAULT_BASE,
) -> DataFrame:
    """Direct-map ``df`` to a TERM_COLS triples frame.

    ``key``: primary-key column(s) → IRI row nodes; ``None`` → blank
    nodes labelled ``_:md5(table ':' all-cells)`` (deterministic).
    ``refs``: ``{fk_col: (target_table, target_key_col)}`` → reference
    triples pointing at the target table's row nodes (same ``base``).
    """
    refs = refs or {}
    key_cols = [key] if isinstance(key, str) else key

    if key_cols:
        subj_kind = F.lit(TM.KIND_IRI)
        subj = row_node(table, key_cols, base)
    else:
        subj_kind = F.lit(TM.KIND_BNODE)
        cells = [F.col(c).cast("string") for c in df.columns]
        subj = F.concat(
            F.lit("_:"),
            F.md5(F.concat_ws("\x1f", F.lit(table), *cells)),
        )

    struct_t = (
        "p_val string, o_kind string, o_val string, o_datatype string"
    )
    cands: list[Column] = [
        # class triple (rdf:type <base><table>)
        F.struct(
            F.lit(_RDF_TYPE).alias("p_val"),
            F.lit(TM.KIND_IRI).alias("o_kind"),
            F.lit(base + table).alias("o_val"),
            F.lit(None).cast("string").alias("o_datatype"),
        )
    ]
    for field in df.schema.fields:
        lex, dt = _literal_of(F.col(field.name), field.dataType)
        cands.append(
            F.struct(
                F.lit(base + table + "#" + field.name).alias("p_val"),
                F.lit(TM.KIND_LITERAL).alias("o_kind"),
                lex.alias("o_val"),
                dt.alias("o_datatype"),
            )
        )
    for fk_col, (target, target_key) in sorted(refs.items()):
        target_node = F.concat(
            F.lit(base + target + "/" + target_key + "="),
            F.col(fk_col).cast("string"),
        )
        cands.append(
            F.struct(
                F.lit(base + table + "#ref-" + fk_col).alias("p_val"),
                F.lit(TM.KIND_IRI).alias("o_kind"),
                target_node.alias("o_val"),
                F.lit(None).cast("string").alias("o_datatype"),
            )
        )

    exploded = df.select(
        subj_kind.alias("s_kind"),
        subj.alias("s_val"),
        F.explode(F.array(*cands).cast(f"array<struct<{struct_t}>>")).alias("t"),
    )
    return exploded.where(F.col("t.o_val").isNotNull()).select(
        "s_kind",
        "s_val",
        F.col("t.p_val").alias("p_val"),
        F.col("t.o_kind").alias("o_kind"),
        F.col("t.o_val").alias("o_val"),
        F.col("t.o_datatype").alias("o_datatype"),
        F.lit(None).cast("string").alias("o_lang"),
    )
