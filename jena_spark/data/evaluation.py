"""Binary-classifier evaluation — confusion counts and P/R/F1 in
exact integer ppm.

The closing piece of the quality-classifier story (train:
``data/classifier.py``; agree-with-rules: ``data/agreement.py``):
score predictions against gold labels and report the canonical
confusion matrix with precision / recall / F1 — what a filter's
release note quotes.

Integer recipe: ``precision_ppm = floor(10^6 * tp / (tp+fp))``,
``recall_ppm = floor(10^6 * tp / (tp+fn))``, and F1 as the harmonic
mean computed from the RAW counts — ``f1_ppm = floor(10^6 * 2tp /
(2tp + fp + fn))`` — one floor each, never a floor-of-floors (the
two-stage rounding would drift from the oracle). Undefined ratios
(empty denominators) are NULL, not 0 — a filter that predicts
nothing has no precision, not perfect precision.

Distributed shape: one inner join on the id (gold is usually small —
broadcast), one 4-cell partial-agg contingency, scalar arithmetic on
a 1-row frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PPM = 10**6


def classifier_eval(pred: DataFrame, gold: DataFrame,
                    id_col: str = "doc_id",
                    pred_col: str = "pred",
                    gold_col: str = "label") -> DataFrame:
    """One row: ``(n, tp, fp, fn, tn, accuracy_ppm, precision_ppm,
    recall_ppm, f1_ppm)`` over ids present in both frames."""
    p = pred.select(F.col(id_col).alias("_id"),
                    F.col(pred_col).cast("boolean").alias("_p"))
    g = gold.select(F.col(id_col).alias("_id"),
                    F.col(gold_col).cast("boolean").alias("_g"))
    cells = p.join(g, "_id").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.when(F.col("_p") & F.col("_g"), 1).otherwise(0))
         .cast("long").alias("tp"),
        F.sum(F.when(F.col("_p") & ~F.col("_g"), 1).otherwise(0))
         .cast("long").alias("fp"),
        F.sum(F.when(~F.col("_p") & F.col("_g"), 1).otherwise(0))
         .cast("long").alias("fn"),
        F.sum(F.when(~F.col("_p") & ~F.col("_g"), 1).otherwise(0))
         .cast("long").alias("tn"))
    return cells.select(
        "n", "tp", "fp", "fn", "tn",
        F.expr(f"case when n = 0 then null else"
               f" ({PPM} * (tp + tn)) div n end").alias("accuracy_ppm"),
        F.expr(f"case when tp + fp = 0 then null else"
               f" ({PPM} * tp) div (tp + fp) end").alias("precision_ppm"),
        F.expr(f"case when tp + fn = 0 then null else"
               f" ({PPM} * tp) div (tp + fn) end").alias("recall_ppm"),
        F.expr(f"case when 2 * tp + fp + fn = 0 then null else"
               f" ({PPM} * 2 * tp) div (2 * tp + fp + fn) end")
         .alias("f1_ppm"))


def classifier_eval_sql(pred_cte: str, gold_cte: str,
                        id_col: str = "doc_id", pred_col: str = "pred",
                        gold_col: str = "label") -> str:
    """DuckDB twin of :func:`classifier_eval`."""
    return f"""WITH p AS (SELECT {id_col} AS _id,
                CAST({pred_col} AS BOOLEAN) AS _p FROM ({pred_cte})),
g AS (SELECT {id_col} AS _id, CAST({gold_col} AS BOOLEAN) AS _g
      FROM ({gold_cte})),
cells AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN _p AND _g THEN 1 ELSE 0 END) AS BIGINT)
           AS tp,
         CAST(sum(CASE WHEN _p AND NOT _g THEN 1 ELSE 0 END) AS BIGINT)
           AS fp,
         CAST(sum(CASE WHEN NOT _p AND _g THEN 1 ELSE 0 END) AS BIGINT)
           AS fn,
         CAST(sum(CASE WHEN NOT _p AND NOT _g THEN 1 ELSE 0 END)
              AS BIGINT) AS tn
  FROM p JOIN g USING (_id))
SELECT n, tp, fp, fn, tn,
       CASE WHEN n = 0 THEN NULL
            ELSE ({PPM} * (tp + tn)) // n END AS accuracy_ppm,
       CASE WHEN tp + fp = 0 THEN NULL
            ELSE ({PPM} * tp) // (tp + fp) END AS precision_ppm,
       CASE WHEN tp + fn = 0 THEN NULL
            ELSE ({PPM} * tp) // (tp + fn) END AS recall_ppm,
       CASE WHEN 2 * tp + fp + fn = 0 THEN NULL
            ELSE ({PPM} * 2 * tp) // (2 * tp + fp + fn) END AS f1_ppm
FROM cells"""
