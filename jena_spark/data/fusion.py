"""Reciprocal-rank fusion (RRF) — hybrid-retrieval rank merging.

RRF (Cormack, Clarke & Buettcher, SIGIR 2009) is the standard way to
merge ranked lists from heterogeneous retrieval systems (BM25 +
dense ANN being the canonical hybrid): each system contributes
``1 / (K + rank)`` per (query, doc), summed across systems — robust
to incomparable score scales because only ranks survive. The repo's
integer recipe makes it exact: contributions are
``floor(10^6 / (K + rank))`` micro-units, so Spark and DuckDB sums
agree bit-for-bit and fused ties break deterministically by doc id.

Distributed shape: union the (already small) per-system top-k lists,
one (qid, did) hash aggregation with map-side combine, one per-query
window for the fused rank. The inputs are k-bounded per query by
construction, so the fusion stage is negligible next to the systems
that produced them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: the RRF damping constant — 60 per the original paper.
RRF_K = 60
#: integer scale of one contribution.
RRF_SCALE = 10**6


def rrf_fuse(rankings: dict[str, DataFrame], k: int = 10,
             rrf_k: int = RRF_K, qid: str = "qid",
             did: str = "did", rank: str = "rank") -> DataFrame:
    """Fuse named ranked lists into ``(qid, did, rrf_u, n_systems,
    rank)``: ``rrf_u = Σ_systems floor(10^6 / (rrf_k + rank_s))``,
    ``n_systems`` = how many lists carried the pair, fused ``rank``
    1-based by ``(rrf_u desc, did asc)``, truncated to top-``k``."""
    if not rankings:
        raise ValueError("rankings must be a non-empty dict")
    if k <= 0 or rrf_k < 0:
        raise ValueError(f"bad k={k} / rrf_k={rrf_k}")
    parts = []
    for name, df in rankings.items():
        parts.append(df.select(
            F.col(qid).alias("qid"), F.col(did).alias("did"),
            F.expr(f"{RRF_SCALE} div ({rrf_k} + {rank})")
             .cast("long").alias("_c")))
    allc = parts[0]
    for p in parts[1:]:
        allc = allc.unionByName(p)
    fused = (allc.groupBy("qid", "did")
             .agg(F.sum("_c").cast("long").alias("rrf_u"),
                  F.count("*").cast("long").alias("n_systems")))
    w = Window.partitionBy("qid").orderBy(
        F.col("rrf_u").desc(), F.col("did").asc())
    return (fused.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("qid", "did", "rrf_u", "n_systems",
                    F.col("rank").cast("int").alias("rank")))


def rrf_fuse_sql(ranking_ctes: dict[str, str], k: int = 10,
                 rrf_k: int = RRF_K) -> str:
    """DuckDB twin of :func:`rrf_fuse`. Each CTE body must yield
    ``(qid, did, rank)``."""
    if not ranking_ctes:
        raise ValueError("ranking_ctes must be a non-empty dict")
    srcs = ",\n".join(f"sys_{name} AS MATERIALIZED ({cte})"
                      for name, cte in ranking_ctes.items())
    unions = "\nUNION ALL\n".join(
        f"SELECT qid, did, {RRF_SCALE} // ({rrf_k} + rank) AS c"
        f" FROM sys_{name}" for name in ranking_ctes)
    return f"""WITH {srcs},
allc AS ({unions}),
fused AS (
  SELECT qid, did, CAST(sum(c) AS BIGINT) AS rrf_u,
         CAST(count(*) AS BIGINT) AS n_systems
  FROM allc GROUP BY qid, did),
r AS (
  SELECT *, row_number() OVER (PARTITION BY qid
           ORDER BY rrf_u DESC, did ASC) AS rank
  FROM fused)
SELECT qid, did, rrf_u, n_systems, CAST(rank AS INT) AS rank
FROM r WHERE rank <= {k}"""
