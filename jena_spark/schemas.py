"""Table schemas (SURVEY.md §1.6, FIXTURES.md §§1-3).

* ``transcripts`` — the pipeline input (BASELINE.json input_hint):
  (conv_id string, turn_idx int, role string, text string,
   tool string, ts timestamp).
* ``triples`` — Jena term model flattened (cf. ``Triple.java:40``:
  s/p/o all non-null Nodes; predicates are IRIs).
* ``nodes`` / ``edges`` — materialized graph tables.
"""

from __future__ import annotations

from pyspark.sql import types as T

TRANSCRIPTS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), False),
    ]
)

TRIPLES_SCHEMA = T.StructType(
    [
        T.StructField("s_kind", T.StringType(), False),
        T.StructField("s_val", T.StringType(), False),
        T.StructField("p_val", T.StringType(), False),
        T.StructField("o_kind", T.StringType(), False),
        T.StructField("o_val", T.StringType(), False),
        T.StructField("o_datatype", T.StringType(), True),
        T.StructField("o_lang", T.StringType(), True),
        T.StructField("graph", T.StringType(), True),
        T.StructField("conv_id", T.StringType(), True),  # provenance / lineage
    ]
)

NODES_SCHEMA = T.StructType(
    [
        T.StructField("node_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("val", T.StringType(), False),
        T.StructField("datatype", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("canonical_id", T.StringType(), True),
    ]
)

EDGES_SCHEMA = T.StructType(
    [
        T.StructField("src", T.StringType(), False),
        T.StructField("dst", T.StringType(), False),
        T.StructField("pred", T.StringType(), False),
        T.StructField("weight", T.DoubleType(), True),
        T.StructField("conv_id", T.StringType(), True),
    ]
)

GOLD_MENTIONS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("surface", T.StringType(), False),
        T.StructField("entity", T.StringType(), False),
    ]
)
