"""jena_spark — a PySpark-native knowledge-graph construction engine.

Re-creates Apache Jena's RDF Model/Graph semantics (reference:
/root/reference, Apache Jena fork ``dacasals/jena``) as idiomatic
PySpark: a flat triple table (DataFrame), deterministic blank-node
skolemization, owl:sameAs canonicalization via connected components,
and a Jena-equivalent query surface (``find(s,p,o)``, graph
union/intersection/difference, BGP joins, SPARQL-algebra operators)
expressed as DataFrame/SQL plans that Catalyst optimizes.

This is NOT a port of Jena's Java engine — it is a Spark-first design
that matches the reference's *semantics* (cited per-module as
``file:line`` against the reference root).
"""

__version__ = "0.1.0"
