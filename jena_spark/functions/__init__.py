"""SPARQL scalar function library (SURVEY.md §2.8)."""

from jena_spark.functions.scalar import SPARQL_FUNCTIONS  # noqa: F401
