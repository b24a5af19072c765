"""Jena-equivalent query surface over the materialized triple table.

``graph`` — the Graph/Model contract (find, contains, enumeration,
union/intersection/difference); ``algebra`` — SPARQL-algebra operators
(BGP, filter, project, optional, minus, exists, group, order/slice,
values); ``paths`` — property paths incl. iterative transitive closure.
"""
