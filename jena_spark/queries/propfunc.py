"""Property functions — table-generating "magic predicates" (§2.9).

Reference: registry ``jena-arq/.../sparql/pfunction/PropertyFunctionRegistry.java``,
library of 21 built-ins under ``sparql/pfunction/library/`` (e.g.
``list:member``, ``apf:strSplit``, ``apf:splitIRI``), executed via
``OpPropFunc`` (``OpExecutor.java:198``). A property function consumes
a binding row and yields 0..n rows — in Spark that is exactly
``explode`` over a generated array (or a projection for 1:1 functions),
staying fully inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def str_split(bindings: DataFrame, src: Column, out_var: str, sep: str = " ") -> DataFrame:
    """apf:strSplit — one output row per split part (order not
    significant, SPARQL set semantics)."""
    return bindings.withColumn(out_var, F.explode(F.split(src, sep)))


def split_iri(bindings: DataFrame, iri: Column, ns_var: str, local_var: str) -> DataFrame:
    """apf:splitIRI — namespace / local-name decomposition (1:1)."""
    return bindings.withColumn(
        ns_var, F.regexp_extract(iri, r"^(.*[#/])", 1)
    ).withColumn(local_var, F.regexp_extract(iri, r"([^#/]*)$", 1))


def list_member(bindings: DataFrame, arr: Column, out_var: str) -> DataFrame:
    """list:member — one row per element of a collection column."""
    return bindings.withColumn(out_var, F.explode(arr))


def list_index(bindings: DataFrame, arr: Column, idx_var: str, member_var: str) -> DataFrame:
    """list:index (``pfunction/library/listIndex.java``) — one row per
    (0-based position, member)."""
    return bindings.select("*", F.posexplode(arr).alias(idx_var, member_var))


def list_length(bindings: DataFrame, arr: Column, out_var: str) -> DataFrame:
    """list:length (``listLength.java``) — 1:1 length binding."""
    return bindings.withColumn(out_var, F.size(arr))


def concat(bindings: DataFrame, out_var: str, *parts: Column) -> DataFrame:
    """apf:concat (``concat.java``) — object := concat of subject list."""
    return bindings.withColumn(out_var, F.concat(*parts))


def seq(bindings: DataFrame, arr: Column, idx_var: str, member_var: str) -> DataFrame:
    """apf:seq / rdf:Seq membership (``seq.java``) — ordered container:
    one row per member with its 1-based ordinal (rdf:_n)."""
    out = bindings.select("*", F.posexplode(arr).alias("_p", member_var))
    return out.withColumn(idx_var, F.col("_p") + 1).drop("_p")


def bag(bindings: DataFrame, arr: Column, member_var: str) -> DataFrame:
    """apf:bag / rdf:Bag membership (``bag.java``) — unordered container:
    one row per member, no ordinal."""
    return bindings.select("*", F.explode(arr).alias(member_var))
