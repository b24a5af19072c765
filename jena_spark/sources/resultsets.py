"""SELECT result-set sinks — CSV / TSV / JSON (§2.1).

Reference: ``jena-arq/.../sparql/resultset/{CSVOutput,TSVOutput,
JSONOutput}.java`` serialize SELECT results. Spark mapping is the
built-in writers; the only semantics work is SPARQL's TSV term syntax
(IRIs bracketed, literals quoted) which :func:`write_tsv` reproduces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_csv(results: DataFrame, path: str) -> None:
    """CSVOutput parity: plain lexical values, header row."""
    results.write.mode("overwrite").option("header", True).csv(path)


def write_json(results: DataFrame, path: str) -> None:
    """JSONOutput parity (one binding object per line)."""
    results.write.mode("overwrite").json(path)


def write_tsv(results: DataFrame, path: str) -> None:
    """TSVOutput parity: SPARQL TSV quotes terms. Var-struct columns
    (kind, val, datatype, lang) are rendered as N-Triples-style terms;
    plain string columns pass through."""
    cols = []
    for name, dtype in results.dtypes:
        if dtype.startswith("struct"):
            c = F.col(name)
            term = (
                F.when(c.getField("kind") == "iri",
                       F.concat(F.lit("<"), c.getField("val"), F.lit(">")))
                .when(c.getField("kind") == "bnode", c.getField("val"))
                .otherwise(F.concat(F.lit("\""), c.getField("val"), F.lit("\"")))
            )
            cols.append(term.alias(name))
        else:
            cols.append(F.col(name))
    # disable the CSV writer's own quoting: terms are already quoted
    # SPARQL-TSV style and tabs cannot appear inside them
    results.select(*cols).write.mode("overwrite").option("sep", "\t").option(
        "header", True
    ).option("quote", "").csv(path)
