"""Inter-classifier agreement — Cohen's kappa in exact integer ppm.

When two automated quality gates disagree (an NB classifier vs a
rule battery, two annotator models, a new filter vs the one it
replaces), raw percent-agreement overstates consensus on skewed
labels; Cohen's kappa corrects for chance agreement and is the
standard annotation-QA statistic. Computed here over two boolean
verdict frames keyed by document id.

Exact integer recipe: with contingency counts ``a``(1,1) ``b``(1,0)
``c``(0,1) ``d``(0,0), ``n = a+b+c+d``,

    kappa = (n*(a+d) - S) / (n^2 - S),
    S = (a+b)*(a+c) + (c+d)*(b+d)

— one rational, scaled to ppm with a sign-split floor (Spark ``div``
truncates toward zero while DuckDB ``//`` floors, so negative kappas
must be floored explicitly; the CASE keeps both engines on
non-negative operands where the operators agree). ``n^2 == S``
(degenerate marginals, e.g. one rater constant) yields NULL.

Distributed shape: one inner join on the id, one 4-cell partial-agg
contingency, driver-free scalar arithmetic on a 1-row frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PPM = 10**6


def cohens_kappa(left: DataFrame, right: DataFrame,
                 id_col: str = "doc_id", flag: str = "flag") -> DataFrame:
    """One row: ``(n, n11, n10, n01, n00, po_ppm, kappa_ppm)`` over
    ids present in BOTH frames (inner join — kappa is defined on
    co-rated items)."""
    l = left.select(F.col(id_col).alias("_id"),
                    F.col(flag).cast("boolean").alias("_l"))
    r = right.select(F.col(id_col).alias("_id"),
                     F.col(flag).cast("boolean").alias("_r"))
    j = l.join(r, "_id")
    cells = j.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.when(F.col("_l") & F.col("_r"), 1).otherwise(0))
         .cast("long").alias("n11"),
        F.sum(F.when(F.col("_l") & ~F.col("_r"), 1).otherwise(0))
         .cast("long").alias("n10"),
        F.sum(F.when(~F.col("_l") & F.col("_r"), 1).otherwise(0))
         .cast("long").alias("n01"),
        F.sum(F.when(~F.col("_l") & ~F.col("_r"), 1).otherwise(0))
         .cast("long").alias("n00"))
    num = F.expr("n * (n11 + n00) - ((n11+n10)*(n11+n01)"
                 " + (n01+n00)*(n10+n00))")
    den = F.expr("n * n - ((n11+n10)*(n11+n01) + (n01+n00)*(n10+n00))")
    return cells.select(
        "n", "n11", "n10", "n01", "n00",
        F.expr(f"case when n = 0 then null else"
               f" ({PPM} * (n11 + n00)) div n end").alias("po_ppm"),
        F.when(den == 0, F.lit(None).cast("long"))
         .when(num >= 0,
               F.expr(f"({PPM} * (n * (n11 + n00)"
                      f" - ((n11+n10)*(n11+n01) + (n01+n00)*(n10+n00))))"
                      f" div (n * n - ((n11+n10)*(n11+n01)"
                      f" + (n01+n00)*(n10+n00)))"))
         .otherwise(
             -F.expr(f"((-(n * (n11 + n00)"
                     f" - ((n11+n10)*(n11+n01) + (n01+n00)*(n10+n00))))"
                     f" * {PPM} + (n * n - ((n11+n10)*(n11+n01)"
                     f" + (n01+n00)*(n10+n00))) - 1)"
                     f" div (n * n - ((n11+n10)*(n11+n01)"
                     f" + (n01+n00)*(n10+n00)))"))
         .cast("long").alias("kappa_ppm"))


def cohens_kappa_sql(left_cte: str, right_cte: str,
                     id_col: str = "doc_id", flag: str = "flag") -> str:
    """DuckDB twin of :func:`cohens_kappa` (same sign-split floor)."""
    S = "((n11+n10)*(n11+n01) + (n01+n00)*(n10+n00))"
    num = f"(n * (n11 + n00) - {S})"
    den = f"(n * n - {S})"
    return f"""WITH l AS (SELECT {id_col} AS _id,
                CAST({flag} AS BOOLEAN) AS _l FROM ({left_cte})),
r AS (SELECT {id_col} AS _id, CAST({flag} AS BOOLEAN) AS _r
      FROM ({right_cte})),
j AS (SELECT * FROM l JOIN r USING (_id)),
cells AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN _l AND _r THEN 1 ELSE 0 END) AS BIGINT)
           AS n11,
         CAST(sum(CASE WHEN _l AND NOT _r THEN 1 ELSE 0 END) AS BIGINT)
           AS n10,
         CAST(sum(CASE WHEN NOT _l AND _r THEN 1 ELSE 0 END) AS BIGINT)
           AS n01,
         CAST(sum(CASE WHEN NOT _l AND NOT _r THEN 1 ELSE 0 END)
              AS BIGINT) AS n00
  FROM j)
SELECT n, n11, n10, n01, n00,
       CASE WHEN n = 0 THEN NULL
            ELSE ({PPM} * (n11 + n00)) // n END AS po_ppm,
       CASE WHEN {den} = 0 THEN NULL
            WHEN {num} >= 0 THEN ({PPM} * {num}) // {den}
            ELSE -(((-{num}) * {PPM} + {den} - 1) // {den})
       END AS kappa_ppm
FROM cells"""
