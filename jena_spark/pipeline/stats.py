"""Graph statistics — jena-elephas parity (SURVEY.md §2.13) + TDB stats.

Each MapReduce job in
``jena-elephas/jena-elephas-mapreduce/.../rdf/mapreduce/`` becomes a
one-shuffle DataFrame aggregation; ``characteristic_sets`` mirrors
``characteristics/AbstractCharacteristicSetGeneratingReducer.java:60``;
``predicate_counts`` also feeds join-order statistics the way TDB's
``StatsCollector`` (``jena-tdb/.../solver/stats/StatsCollector.java:27``)
feeds ``StatsMatcher``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def predicate_counts(triples: DataFrame) -> DataFrame:
    """≙ TriplePredicateCountMapper + NodeCountReducer."""
    return triples.groupBy(F.col("p_val").alias("predicate")).agg(
        F.count("*").alias("n")
    )


def subject_counts(triples: DataFrame) -> DataFrame:
    return triples.groupBy(
        F.col("s_kind").alias("kind"), F.col("s_val").alias("subject")
    ).agg(F.count("*").alias("n"))


def object_counts(triples: DataFrame) -> DataFrame:
    return triples.groupBy(
        F.col("o_kind").alias("kind"), F.col("o_val").alias("object")
    ).agg(F.count("*").alias("n"))


def node_counts(triples: DataFrame) -> DataFrame:
    """≙ TripleNodeCountMapper: every position flattened then counted."""
    nodes = (
        triples.select(F.col("s_kind").alias("kind"), F.col("s_val").alias("val"))
        .unionByName(triples.select(F.lit("iri").alias("kind"), F.col("p_val").alias("val")))
        .unionByName(triples.select(F.col("o_kind").alias("kind"), F.col("o_val").alias("val")))
    )
    return nodes.groupBy("kind", "val").agg(F.count("*").alias("n"))


def datatype_counts(triples: DataFrame) -> DataFrame:
    """≙ TripleDataTypeCountMapper (literals only)."""
    return (
        triples.where(F.col("o_kind") == "literal")
        .groupBy(F.coalesce("o_datatype", F.lit("plain")).alias("datatype"))
        .agg(F.count("*").alias("n"))
    )


def _namespace(col):
    # namespace = IRI up to the last '#' or '/' (elephas namespace counts)
    return F.regexp_extract(col, r"^(.*[#/])", 1)


def namespace_counts(triples: DataFrame) -> DataFrame:
    ns = (
        triples.select(_namespace(F.col("p_val")).alias("ns"))
        .unionByName(triples.where(F.col("s_kind") == "iri")
                     .select(_namespace(F.col("s_val")).alias("ns")))
        .unionByName(triples.where(F.col("o_kind") == "iri")
                     .select(_namespace(F.col("o_val")).alias("ns")))
    )
    return ns.groupBy("ns").agg(F.count("*").alias("n"))


def characteristic_sets(triples: DataFrame) -> DataFrame:
    """Distinct sorted predicate-set per subject, counted — the classic
    structural statistic for cardinality estimation."""
    return (
        triples.groupBy("s_kind", "s_val")
        .agg(F.sort_array(F.collect_set("p_val")).alias("pred_set"))
        .groupBy("pred_set")
        .agg(F.count("*").alias("n_subjects"))
    )
