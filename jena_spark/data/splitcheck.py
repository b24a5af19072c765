"""Split-leakage validation — proving a train/valid/test split is
clean.

``data/splits.py`` CONSTRUCTS a leakage-safe split; this op VERIFIES
one (yours or anyone's): across every pair of distinct splits, count

* ``n_exact`` — document pairs with identical ``md5(text)`` content
  landing in different splits (hard leakage), and
* ``n_near`` — pairs whose lowercased ``\\w+`` token SETS overlap at
  or above an integer per-mille Jaccard threshold (the fuzzy
  conversation-dedup recipe) — soft leakage that inflates eval
  scores.

The near check is an inverted-index token join under a ``max_df``
hot-token cap (the corpus-dedup posture — mandatory at scale,
documented when it truncates), never an all-pairs product; the exact
check is one (hash → splits) census. Output is one row per
unordered split pair including clean (0, 0) rows, so the verdict
frame has a stable shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _tokens(col):
    return F.array_distinct(
        F.filter(F.split(F.lower(col), r"\W+"), lambda t: t != ""))


def split_leakage(docs: DataFrame, threshold_pm: int = 500,
                  max_df: int = 500, id_col: str = "doc_id",
                  text: str = "text",
                  split: str = "split") -> DataFrame:
    """``(split_a, split_b, n_exact, n_near)`` — one row per
    unordered pair of distinct split labels present in the data."""
    if not 0 <= threshold_pm <= 1000:
        raise ValueError(f"threshold_pm must be in [0,1000]")
    if max_df < 1:
        raise ValueError(f"max_df must be >= 1, got {max_df}")
    d = docs.select(F.col(id_col).alias("_id"),
                    F.col(split).alias("_s"),
                    F.md5(F.col(text)).alias("_h"),
                    _tokens(F.col(text)).alias("_w"))

    # all unordered split-label pairs (stable output shape)
    labels = d.select(F.col("_s").alias("l")).distinct()
    base = (labels.alias("x").join(labels.alias("y"),
                                   F.col("x.l") < F.col("y.l"))
            .select(F.col("x.l").alias("split_a"),
                    F.col("y.l").alias("split_b")))

    # hard leakage: same content hash, different splits
    a, b = d.alias("a"), d.alias("b")
    exact = (a.join(b, (F.col("a._h") == F.col("b._h"))
                    & (F.col("a._s") < F.col("b._s")))
             .groupBy(F.col("a._s").alias("split_a"),
                      F.col("b._s").alias("split_b"))
             .agg(F.count("*").cast("long").alias("n_exact")))

    # soft leakage: token-set Jaccard >= threshold via inverted index
    tok = (d.select("_id", "_s", F.explode("_w").alias("_t"),
                    F.size("_w").alias("_n")))
    hot = (tok.groupBy("_t").agg(F.count("*").alias("_df"))
           .where(F.col("_df") > max_df).select("_t"))
    tok = tok.join(hot, "_t", "left_anti")
    ta, tb = tok.alias("ta"), tok.alias("tb")
    shared = (ta.join(tb, (F.col("ta._t") == F.col("tb._t"))
                      & (F.col("ta._s") < F.col("tb._s")))
              .groupBy(F.col("ta._id").alias("ia"),
                       F.col("tb._id").alias("ib"),
                       F.col("ta._s").alias("split_a"),
                       F.col("tb._s").alias("split_b"),
                       F.col("ta._n").alias("na"),
                       F.col("tb._n").alias("nb"))
              .agg(F.count("*").cast("long").alias("_inter")))
    near = (shared.where(
        F.expr("(1000 * _inter) div (na + nb - _inter)")
        >= threshold_pm)
        .groupBy("split_a", "split_b")
        .agg(F.count("*").cast("long").alias("n_near")))

    return (base.join(exact, ["split_a", "split_b"], "left")
            .join(near, ["split_a", "split_b"], "left")
            .select("split_a", "split_b",
                    F.coalesce("n_exact", F.lit(0)).cast("long")
                    .alias("n_exact"),
                    F.coalesce("n_near", F.lit(0)).cast("long")
                    .alias("n_near")))


def split_leakage_sql(docs_cte: str, threshold_pm: int = 500,
                      max_df: int = 500, id_col: str = "doc_id",
                      text: str = "text", split: str = "split") -> str:
    """DuckDB twin of :func:`split_leakage` (identical tokenization,
    df cap, and integer per-mille threshold)."""
    return f"""WITH d AS (
  SELECT {id_col} AS _id, {split} AS _s, md5({text}) AS _h,
         list_distinct(list_filter(
           regexp_split_to_array(lower({text}), '\\W+'),
           x -> x != '')) AS _w
  FROM ({docs_cte})),
labels AS (SELECT DISTINCT _s AS l FROM d),
base AS (SELECT x.l AS split_a, y.l AS split_b
         FROM labels x JOIN labels y ON x.l < y.l),
exact AS (
  SELECT a._s AS split_a, b._s AS split_b,
         CAST(count(*) AS BIGINT) AS n_exact
  FROM d a JOIN d b ON a._h = b._h AND a._s < b._s
  GROUP BY a._s, b._s),
tok AS (
  SELECT _id, _s, unnest(_w) AS _t, len(_w) AS _n FROM d),
hot AS (SELECT _t FROM tok GROUP BY _t HAVING count(*) > {max_df}),
tokc AS (SELECT * FROM tok WHERE _t NOT IN (SELECT _t FROM hot)),
shared AS (
  SELECT ta._id AS ia, tb._id AS ib, ta._s AS split_a,
         tb._s AS split_b, ta._n AS na, tb._n AS nb,
         CAST(count(*) AS BIGINT) AS inter
  FROM tokc ta JOIN tokc tb ON ta._t = tb._t AND ta._s < tb._s
  GROUP BY ta._id, tb._id, ta._s, tb._s, ta._n, tb._n),
near AS (
  SELECT split_a, split_b, CAST(count(*) AS BIGINT) AS n_near
  FROM shared
  WHERE (1000 * inter) // (na + nb - inter) >= {threshold_pm}
  GROUP BY split_a, split_b)
SELECT base.split_a, base.split_b,
       CAST(coalesce(exact.n_exact, 0) AS BIGINT) AS n_exact,
       CAST(coalesce(near.n_near, 0) AS BIGINT) AS n_near
FROM base
LEFT JOIN exact ON base.split_a = exact.split_a
               AND base.split_b = exact.split_b
LEFT JOIN near ON base.split_a = near.split_a
              AND base.split_b = near.split_b"""
