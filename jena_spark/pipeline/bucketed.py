"""Bucketed encoded store — the TDB triple-index posture as Spark
bucketed tables.

Reference: TDB keeps the triple table clustered three ways — SPO / POS
/ OSP B+Tree indexes over fixed-width id-tuples
(``jena-tdb/.../sys/Names.java:24-25``; bulk build "one write per sort
order", ``store/bulkloader/BuilderSecondaryIndexesParallel.java``) —
so that any bound-position lookup and any subject-subject merge join
runs over co-located, pre-sorted ids.

The Spark-native twin is a **bucketed, sorted table per access path**:
``bucketBy(n, key).sortBy(key)`` at write time records the hash
partitioning in the catalog, and every later join or aggregation keyed
on that column reads the layout instead of shuffling — Catalyst plans
``SortMergeJoin`` with NO Exchange on either side (asserted in
``tests/test_bucketed.py``). At 100 TB this is the difference between
a BGP star query shuffling the whole triple table per join and a
zero-shuffle merge join per bucket; it is also exactly the "one write
per sort-order" trade the TDB loader makes — pay sorted writes once,
query forever.

Two access paths cover the BGP workload (mirroring which TDB indexes
the solver actually hits, ``solver/StageMatchTuple.java``):

* ``<prefix>_spo`` — bucketed+sorted by ``s_id``: subject-star joins
  (the dominant BGP shape), S?? lookups.
* ``<prefix>_osp`` — bucketed+sorted by ``o_id``: object-position
  joins (s-o chains), ??O lookups.
* ``<prefix>_pos`` — OPT-IN predicate-led layout (``Names.java:24``'s
  POS order), bucketed+sorted by the composite ``(p_id, o_id)``.
  The skew caveat that kept this path out by default: predicates are
  FEW and HOT (one mention predicate can be >⅓ of all rows), so a
  pure-``p_id`` bucket key would hash the whole hot predicate into
  one bucket — a single straggler task at 100 TB. The composite key
  is the salt: ``o_id`` spreads each hot predicate across all
  buckets while keeping every (P,O)-scoped operation co-located, so
  the predicate-led join shape — subjects sharing the same object
  under the same predicate, the co-mention/entity-sharing workload —
  plans with zero Exchange (:func:`po_join_bucketed`); pure-P scans
  still prune on the sorted leading ``p_id`` via row-group min/max.
  Not in the default ``paths`` tuple: a third copy costs 50% more
  storage and only predicate-heavy workloads buy it back.

Quad (dataset) workloads get a third layout, ``<prefix>_gspo``,
bucketed+sorted by the composite (g_id, s_id) — see the quad section
below (``Names.java:27-28``'s GSPO order).

Catalog note: tables are written EXTERNAL (explicit ``path``), so the
parquet lives where the caller says; only the bucketing metadata lives
in the session catalog. A cluster deployment would register the same
layout in its shared metastore / Iceberg catalog (bucket transform).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: access path -> bucket/sort key columns. POS uses the composite
#: (p_id, o_id): o_id is the anti-skew salt for hot predicates (see
#: module docstring).
ACCESS_PATHS = {"spo": ("s_id",), "osp": ("o_id",),
                "pos": ("p_id", "o_id")}


def write_bucketed_store(
    triples_enc: DataFrame,
    prefix: str,
    path: str,
    n_buckets: int = 32,
    paths: tuple[str, ...] = ("spo", "osp"),
) -> dict[str, str]:
    """Write the encoded triple table once per access path, bucketed
    and sorted by that path's key. Returns {access_path: table_name}.

    One-file-per-bucket: rows are repartitioned on the bucket key
    first, so each task owns whole buckets and the sorted-bucket
    metadata lets later joins skip BOTH the exchange and the sort
    (multi-file buckets keep the no-exchange property but re-sort).
    """
    spark = triples_enc.sparkSession
    out: dict[str, str] = {}
    for ap in paths:
        keys = ACCESS_PATHS[ap]
        table = f"{prefix}_{ap}"
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        (
            triples_enc.repartition(n_buckets, *[F.col(k) for k in keys])
            .write.mode("overwrite")
            .option("path", f"{path}/{ap}")
            .bucketBy(n_buckets, *keys)
            .sortBy(*keys)
            .saveAsTable(table)
        )
        out[ap] = table
    return out


def bucketed_table(spark: SparkSession, prefix: str, access_path: str = "spo") -> DataFrame:
    return spark.table(f"{prefix}_{access_path}")


def register_bucketed_store(
    spark: SparkSession,
    prefix: str,
    path: str,
    n_buckets: int = 32,
    paths: tuple[str, ...] = ("spo", "osp"),
) -> dict[str, str]:
    """Re-attach an on-disk bucketed store in a NEW session: the
    parquet outlives the session but the in-memory catalog does not,
    so a fresh driver re-declares the layout with ``CREATE TABLE ...
    CLUSTERED BY ... LOCATION`` (on a cluster this lives in the shared
    metastore / Iceberg catalog and this step disappears). The declared
    bucket spec MUST match what :func:`write_bucketed_store` wrote —
    Spark validates file names against it at read time."""
    out: dict[str, str] = {}
    for ap in paths:
        keys = ", ".join(ACCESS_PATHS[ap])
        table = f"{prefix}_{ap}"
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        spark.sql(f"""
            CREATE TABLE {table}
            (s_id BIGINT, p_id BIGINT, o_id BIGINT, conv_id STRING)
            USING parquet
            CLUSTERED BY ({keys}) SORTED BY ({keys}) INTO {n_buckets} BUCKETS
            LOCATION '{path}/{ap}'
        """)
        out[ap] = table
    return out


# --- quad access path (GSPO) -------------------------------------------------
# Reference: TDB's DATASET indexes are quad orders — GSPO/GPOS/GOSP +
# SPOG/POSG/OSPG (``jena-tdb/.../sys/Names.java:27-28``). The Spark
# twin for GRAPH-restricted workloads is ONE more bucketed layout over
# the encoded quad tuples, keyed by the composite (g_id, s_id): a
# graph-scoped subject-star join keys on exactly that pair (star
# members live in one graph), so every branch reads the co-located
# sorted layout and the join tree plans with zero Exchange — the GSPO
# clustered access path. The remaining five orders buy little here for
# 5× the storage: predicate-bound scans prune on p_id row-group stats
# within GSPO (same argument as POS above), and object-position chains
# keep using the triple-level OSP table.

#: GSPO (graph-scoped subject stars) is the default; GPOS — the
#: graph-scoped predicate-led order (``Names.java:27``) — is opt-in
#: with the same composite-salt rationale as the triple POS: a hot
#: (graph, predicate) pair would collapse a (g_id, p_id) bucket key
#: into one straggler, so ``o_id`` joins the key and spreads it.
QUAD_ACCESS_PATHS = {"gspo": ("g_id", "s_id"),
                     "gpos": ("g_id", "p_id", "o_id")}

#: the reference's default-graph marker (``Quad.defaultGraphIRI``) —
#: null graph columns encode as this IRI so default-graph quads share
#: one well-known g_id.
DEFAULT_GRAPH_IRI = "urn:x-arq:DefaultGraph"


def encode_quads(quads: DataFrame) -> DataFrame:
    """Quad rows (TERM_COLS + ``graph``) -> (g_id, s_id, p_id, o_id)
    id-tuples; pure projection like :func:`encode.encode_triples`."""
    from jena_spark.pipeline.encode import encode_triples, term_id_col

    enc = encode_triples(quads.withColumn(
        "graph", F.coalesce(F.col("graph"), F.lit(DEFAULT_GRAPH_IRI))))
    return enc.select(
        term_id_col(F.lit("iri"), F.col("graph"),
                    F.lit(None), F.lit(None)).alias("g_id"),
        "s_id", "p_id", "o_id",
    )


def write_bucketed_quads(
    quads_enc: DataFrame,
    prefix: str,
    path: str,
    n_buckets: int = 32,
    paths: tuple[str, ...] = ("gspo",),
) -> dict[str, str]:
    """Write the encoded quad table bucketed AND sorted by the
    composite (g_id, s_id) — the GSPO clustered layout."""
    spark = quads_enc.sparkSession
    out: dict[str, str] = {}
    for ap in paths:
        keys = QUAD_ACCESS_PATHS[ap]
        table = f"{prefix}_{ap}"
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        (
            quads_enc.repartition(n_buckets, *[F.col(k) for k in keys])
            .write.mode("overwrite")
            .option("path", f"{path}/{ap}")
            .bucketBy(n_buckets, *keys)
            .sortBy(*keys)
            .saveAsTable(table)
        )
        out[ap] = table
    return out


def register_bucketed_quads(
    spark: SparkSession,
    prefix: str,
    path: str,
    n_buckets: int = 32,
    paths: tuple[str, ...] = ("gspo",),
) -> dict[str, str]:
    """Re-attach an on-disk GSPO store in a new session (same contract
    as :func:`register_bucketed_store`)."""
    out: dict[str, str] = {}
    for ap in paths:
        keys = ", ".join(QUAD_ACCESS_PATHS[ap])
        table = f"{prefix}_{ap}"
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        spark.sql(f"""
            CREATE TABLE {table}
            (g_id BIGINT, s_id BIGINT, p_id BIGINT, o_id BIGINT)
            USING parquet
            CLUSTERED BY ({keys}) SORTED BY ({keys}) INTO {n_buckets} BUCKETS
            LOCATION '{path}/{ap}'
        """)
        out[ap] = table
    return out


def gpo_join_bucketed_quads(
    spark: SparkSession, prefix: str, p_id: int | None = None,
    g_id: int | None = None,
) -> DataFrame:
    """Graph-scoped predicate-led object join over the GPOS table:
    subject pairs sharing the SAME object under the SAME predicate
    WITHIN the same graph — the quad twin of
    :func:`po_join_bucketed` (TDB's GPOS index order,
    ``Names.java:27``). Both sides key on the composite bucket key
    ``(g_id, p_id, o_id)``, so the self-join plans with zero
    Exchange; bound ``g_id``/``p_id`` prune the sorted leading
    columns.

    Returns ``(g_id, p_id, o_id, s_a, s_b)`` with ``s_a < s_b``.
    """
    t = bucketed_table(spark, prefix, "gpos")
    if g_id is not None:
        t = t.where(F.col("g_id") == g_id)
    if p_id is not None:
        t = t.where(F.col("p_id") == p_id)
    a = t.select("g_id", "p_id", "o_id", F.col("s_id").alias("s_a"))
    b = t.select("g_id", "p_id", "o_id", F.col("s_id").alias("s_b"))
    return a.join(b, ["g_id", "p_id", "o_id"]) \
        .where(F.col("s_a") < F.col("s_b"))


def star_join_bucketed_quads(
    spark: SparkSession, prefix: str, p_ids: list[int],
    g_id: int | None = None,
) -> DataFrame:
    """Graph-scoped subject-star BGP over the GSPO table: one branch
    per bound predicate, all joined on the composite (g_id, s_id) —
    the bucket key, so the whole tree plans with zero Exchange. Bound
    GRAPH (``g_id`` given) additionally prunes every branch's scan;
    variable GRAPH returns the graph id as a column (the ``GRAPH ?g``
    shape).

    Returns one row per (graph, subject) matching ALL predicates, with
    columns ``g_id, s_id, o_id_0..o_id_{k-1}``.
    """
    t = bucketed_table(spark, prefix, "gspo")
    if g_id is not None:
        t = t.where(F.col("g_id") == g_id)
    out: DataFrame | None = None
    for i, pid in enumerate(p_ids):
        branch = t.where(F.col("p_id") == pid).select(
            "g_id", "s_id", F.col("o_id").alias(f"o_id_{i}"))
        out = branch if out is None else out.join(branch, ["g_id", "s_id"])
    assert out is not None
    return out


def po_join_bucketed(
    spark: SparkSession, prefix: str, p_id: int | None = None,
) -> DataFrame:
    """Predicate-led object join over the POS table: subject pairs
    sharing the SAME object under the SAME predicate — the
    co-mention / entity-sharing shape (``?a p ?o . ?b p ?o``,
    TDB's POS-index merge join, ``solver/StageMatchTuple.java``'s
    P??-bound path). Both sides key on the composite bucket key
    ``(p_id, o_id)``, so the self-join plans with zero Exchange;
    a bound ``p_id`` additionally prunes both scans on the sorted
    leading column.

    Returns ``(p_id, o_id, s_a, s_b)`` with ``s_a < s_b`` (each
    unordered pair once, no self-pairs).
    """
    t = bucketed_table(spark, prefix, "pos")
    if p_id is not None:
        t = t.where(F.col("p_id") == p_id)
    a = t.select("p_id", "o_id", F.col("s_id").alias("s_a"))
    b = t.select("p_id", "o_id", F.col("s_id").alias("s_b"))
    return a.join(b, ["p_id", "o_id"]).where(F.col("s_a") < F.col("s_b"))


def star_join_bucketed(
    spark: SparkSession, prefix: str, p_ids: list[int],
) -> DataFrame:
    """Subject-star BGP over the bucketed SPO table: one branch per
    bound predicate, all joined on ``s_id`` — the canonical "star"
    query shape. Every branch reads the SAME bucketed layout, so the
    whole join tree plans with zero Exchange operators (the 100 TB
    win this module exists for).

    Returns one row per subject matching ALL predicates, with columns
    ``s_id, o_id_0..o_id_{k-1}``.
    """
    t = bucketed_table(spark, prefix, "spo")
    out: DataFrame | None = None
    for i, pid in enumerate(p_ids):
        branch = t.where(F.col("p_id") == pid).select(
            "s_id", F.col("o_id").alias(f"o_id_{i}"))
        out = branch if out is None else out.join(branch, "s_id")
    assert out is not None
    return out
