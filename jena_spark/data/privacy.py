"""k-anonymity census over quasi-identifier columns.

Before releasing a corpus with metadata, a privacy review asks: does
any combination of quasi-identifiers (language, source, length
bucket, …) isolate fewer than *k* documents? Rows in groups smaller
than ``k`` are re-identification risks (Sweeney 2002); the standard
gate reports the risky groups and per-row verdicts, and the release
either drops those rows or generalizes the identifiers.

This is deliberately the census-and-flag half only — generalization
hierarchies are corpus-specific policy. Everything is one hash
aggregation on the quasi-identifier tuple plus a broadcast-size join
back (group census is bounded by the identifier domain, not the
corpus), so the gate is map-side at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def k_anonymity_census(docs: DataFrame, quasi: list[str],
                       k: int = 5) -> DataFrame:
    """Per-group census ``(*quasi, n, k_anonymous)`` — every distinct
    quasi-identifier tuple with its group size and whether it meets
    the ``k`` threshold. NULL identifier values form their own group
    (a NULL source still isolates)."""
    if not quasi:
        raise ValueError("quasi must name at least one column")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    return (docs.groupBy(*quasi)
            .agg(F.count("*").cast("long").alias("n"))
            .withColumn("k_anonymous", F.col("n") >= k))


def k_anonymity_flags(docs: DataFrame, quasi: list[str], k: int = 5,
                      id_col: str = "doc_id") -> DataFrame:
    """Per-document verdicts ``(id_col, n_group, k_anonymous)`` via a
    null-safe join against the census (the census side is
    domain-bounded, so Catalyst broadcasts it)."""
    census = k_anonymity_census(docs, quasi, k).select(
        *[F.col(c).alias(f"_g_{c}") for c in quasi], "n", "k_anonymous")
    cond = None
    for c in quasi:
        e = docs[c].eqNullSafe(census[f"_g_{c}"])
        cond = e if cond is None else cond & e
    return (docs.join(F.broadcast(census), cond)
            .select(docs[id_col],
                    census["n"].alias("n_group"),
                    census["k_anonymous"]))


def k_anonymity_flags_sql(docs_cte: str, quasi: list[str], k: int = 5,
                          id_col: str = "doc_id") -> str:
    """DuckDB twin of :func:`k_anonymity_flags` (null-safe
    ``IS NOT DISTINCT FROM`` join)."""
    qcols = ", ".join(quasi)
    cond = " AND ".join(
        f"d.{c} IS NOT DISTINCT FROM g.{c}" for c in quasi)
    return f"""WITH docs AS ({docs_cte}),
g AS (SELECT {qcols}, CAST(count(*) AS BIGINT) AS n
      FROM docs GROUP BY {qcols})
SELECT d.{id_col}, g.n AS n_group, g.n >= {k} AS k_anonymous
FROM docs d JOIN g ON {cond}"""
