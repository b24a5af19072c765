"""CSV PropertyTable reader (jena-csv parity).

Reference: the ``jena-csv`` module (``jena-csv/README.md`` — code
retired at Jena 3.9.0, but ``text/csv`` stays a registered RIOT
language, ``jena-arq/.../riot/RDFLanguages.java:46,194-196``). The
PropertyTable RDF view, per the module's published design:

* every data row is one subject — a fresh blank node;
* each column maps to the predicate ``<file-url#column-name>``
  (column name URL-encoded);
* each non-empty cell is one triple; values that parse as numbers
  become ``xsd:double`` literals, everything else a plain string;
* every row also carries ``<http://w3c/future-csv-vocab/row>`` with
  its 1-based row number (``xsd:integer``).

Distributed posture: values parse with Spark's native CSV reader
(JVM, splittable, quote/escape-aware). Row numbers are assigned with
the DataFrame form of ``zipWithIndex`` — within-partition
``row_number`` ordered by ``monotonically_increasing_id`` plus a
broadcast per-partition offset dim — so there is NO global sort and no
Python on the data path. File-source partitions enumerate in (file,
block-offset) order, which makes the numbering deterministic for a
given input layout; multi-file directories number files in path order
exactly like Jena streaming them alphabetically.

Restrictions (documented, erroring — not silent): embedded newlines
inside quoted fields break the row numbering's line=row premise only
if Spark's ``multiLine`` option is requested; we keep the default
one-record-per-line profile, same as the retired module's
simple-CSV scope.
"""

from __future__ import annotations

from urllib.parse import quote

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from jena_spark import terms as TM

#: jena-csv's row-number property (the module's published vocabulary).
CSV_ROW_PRED = "http://w3c/future-csv-vocab/row"

#: lexical forms jena-csv promotes to xsd:double (JVM regex — covers
#: integers, decimals and scientific notation; everything else stays a
#: plain string literal).
_NUM_PAT = r"^[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?$"


def column_predicate(base_iri: str, column: str) -> str:
    """``<file-url#column-name>`` with the column name URL-encoded
    (spaces -> %20 etc.), as the PropertyTable view specifies."""
    return base_iri + "#" + quote(column, safe="")


def _with_row_numbers(df: DataFrame) -> DataFrame:
    """Distributed zipWithIndex in DataFrame form: number rows in
    (partition, in-partition) order via a broadcast offset dim — one
    tiny counting job, no global sort, no Python."""
    spark = df.sparkSession
    base = df.withColumn("_mid", F.monotonically_increasing_id()).withColumn(
        "_part", F.spark_partition_id()
    )
    base = base.persist()
    counts = (
        base.groupBy("_part").agg(F.count("*").alias("_n")).orderBy("_part").collect()
    )
    offsets, acc = [], 0
    for r in counts:
        offsets.append((r["_part"], acc))
        acc += r["_n"]
    off_dim = spark.createDataFrame(offsets, "_part int, _off long")
    w = Window.partitionBy("_part").orderBy("_mid")
    out = (
        base.join(F.broadcast(off_dim), "_part")
        .withColumn("row", (F.row_number().over(w) + F.col("_off")).cast("long"))
        .drop("_mid", "_part", "_off")
    )
    return out


def read_csv_pt(
    spark: SparkSession, path: str, base_iri: str | None = None
) -> DataFrame:
    """Read a CSV file as a PropertyTable graph: TRIPLES-shaped frame
    (``TM.TERM_COLS``), one bnode subject per row.

    ``base_iri`` defaults to ``file://<path>`` like Jena's use of the
    source URL as the table IRI.
    """
    base = base_iri or ("file://" + path)
    df = spark.read.csv(path, header=True, inferSchema=False)
    cols = df.columns
    numbered = _with_row_numbers(df)

    subj = F.concat(F.lit("row-"), F.col("row").cast("string"))
    parts = []
    # the row-number triple first (Jena emits it for every row)
    parts.append(
        numbered.select(
            F.lit(TM.KIND_BNODE).alias("s_kind"),
            subj.alias("s_val"),
            F.lit(CSV_ROW_PRED).alias("p_val"),
            F.lit(TM.KIND_LITERAL).alias("o_kind"),
            F.col("row").cast("string").alias("o_val"),
            F.lit(TM.XSD_INTEGER).alias("o_datatype"),
            F.lit(None).cast("string").alias("o_lang"),
        )
    )
    for c in cols:
        val = F.col(c)
        is_num = val.rlike(_NUM_PAT)
        parts.append(
            numbered.where(val.isNotNull() & (val != ""))
            .select(
                F.lit(TM.KIND_BNODE).alias("s_kind"),
                subj.alias("s_val"),
                F.lit(column_predicate(base, c)).alias("p_val"),
                F.lit(TM.KIND_LITERAL).alias("o_kind"),
                val.alias("o_val"),
                F.when(is_num, F.lit(TM.XSD + "double"))
                .otherwise(F.lit(None).cast("string"))
                .alias("o_datatype"),
                F.lit(None).cast("string").alias("o_lang"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
