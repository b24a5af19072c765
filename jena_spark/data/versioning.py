"""Corpus snapshot diff — the data-versioning census.

Production corpora are rebuilt continuously; before shipping snapshot
N+1 a pipeline diffs it against snapshot N and reviews the churn
(Delta/Iceberg expose this as table history; for plain-parquet corpora
you compute it). The diff is by stable ``doc_id`` with content
equality by hash:

* ``added``     — doc_id only in the new snapshot,
* ``removed``   — doc_id only in the old snapshot,
* ``changed``   — both sides, ``md5(text)`` differs,
* ``unchanged`` — both sides, identical content.

Distributed shape: ONE full outer join on ``doc_id`` (both sides
pre-hashed map-side, so the shuffle carries ``(id, 32-byte hash)``
rows — never the documents themselves) plus a partial-agg census.
At 100 TB the hash projection makes the join input ~KB per thousand
docs; with both snapshots bucketed by doc_id it is shuffle-free.

``snapshot_diff`` returns the per-document verdict frame;
``diff_census`` the (status, n) rollup. The DuckDB twins mirror both.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STATUSES = ["added", "removed", "changed", "unchanged"]


def snapshot_diff(old: DataFrame, new: DataFrame,
                  id_col: str = "doc_id",
                  text: str = "text") -> DataFrame:
    """``(doc_id, status, old_hash, new_hash)`` — one row per doc_id
    present in either snapshot; hashes are ``md5(text)`` (NULL on the
    absent side)."""
    o = old.select(F.col(id_col).alias("_id"),
                   F.md5(F.col(text)).alias("old_hash"))
    n = new.select(F.col(id_col).alias("_id"),
                   F.md5(F.col(text)).alias("new_hash"))
    j = o.join(n, "_id", "full_outer")
    status = (
        F.when(F.col("old_hash").isNull(), F.lit("added"))
        .when(F.col("new_hash").isNull(), F.lit("removed"))
        .when(F.col("old_hash") != F.col("new_hash"), F.lit("changed"))
        .otherwise(F.lit("unchanged")))
    return j.select(F.col("_id").alias(id_col), status.alias("status"),
                    "old_hash", "new_hash")


def diff_census(old: DataFrame, new: DataFrame, id_col: str = "doc_id",
                text: str = "text") -> DataFrame:
    """``(status, n)`` rollup of :func:`snapshot_diff` — every status
    present (zero-count rows included, so the census schema is stable
    across snapshots)."""
    spark = old.sparkSession
    statuses = spark.createDataFrame([(s,) for s in STATUSES],
                                     "status string")
    counts = (snapshot_diff(old, new, id_col, text)
              .groupBy("status").agg(F.count("*").alias("_n")))
    return (statuses.join(counts, "status", "left")
            .select("status",
                    F.coalesce("_n", F.lit(0)).cast("bigint").alias("n")))


def snapshot_diff_sql(old_cte: str, new_cte: str,
                      id_col: str = "doc_id", text: str = "text") -> str:
    """DuckDB twin of :func:`snapshot_diff` over two CTE bodies."""
    return f"""WITH o AS (SELECT {id_col} AS _id, md5({text}) AS old_hash
           FROM ({old_cte})),
n AS (SELECT {id_col} AS _id, md5({text}) AS new_hash
      FROM ({new_cte})),
j AS (SELECT coalesce(o._id, n._id) AS {id_col}, old_hash, new_hash
      FROM o FULL OUTER JOIN n ON o._id = n._id)
SELECT {id_col},
       CASE WHEN old_hash IS NULL THEN 'added'
            WHEN new_hash IS NULL THEN 'removed'
            WHEN old_hash != new_hash THEN 'changed'
            ELSE 'unchanged' END AS status,
       old_hash, new_hash
FROM j"""


def diff_census_sql(old_cte: str, new_cte: str,
                    id_col: str = "doc_id", text: str = "text") -> str:
    """DuckDB twin of :func:`diff_census`."""
    inner = snapshot_diff_sql(old_cte, new_cte, id_col, text)
    vals = ", ".join(f"('{s}')" for s in STATUSES)
    return f"""WITH d AS ({inner}),
c AS (SELECT status, count(*) AS _n FROM d GROUP BY status),
s(status) AS (VALUES {vals})
SELECT s.status, CAST(coalesce(c._n, 0) AS BIGINT) AS n
FROM s LEFT JOIN c ON s.status = c.status"""
