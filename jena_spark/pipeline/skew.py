"""Explicit skew handling: salted two-phase aggregation and salted
joins for hot keys (north-rule requirement).

The construction pipeline's natural skew source is hot entities (a few
IRIs appear in a large fraction of turns — the "celebrity" problem).
Where the hot side of a join is small we broadcast (immune to skew);
where a shuffle is unavoidable these helpers spread one hot key over
``salt`` sub-keys:

* :func:`salted_agg` — two-phase aggregate: partial aggregate on
  (key, salt) spreads the hot key across ``salt`` reducers, then a
  second tiny aggregate merges the partials. Equivalent result, bounded
  per-reducer fan-in. (Spark's own map-side combine already handles
  *count-like* skew; the salted form matters for high-cardinality
  accumulators like collect_set/countDistinct where one reducer would
  otherwise receive the whole hot key's stream.)
* :func:`salted_join` — replicate the small side ``salt`` times with an
  explicit salt column and split the big side's rows deterministically;
  one hot key's probe stream lands on ``salt`` different reducers.
  This is the manual form of what AQE skew-join splitting
  (``spark.sql.adaptive.skewJoin.enabled``, on in session.py) does at
  runtime — kept explicit so plans are deterministic when AQE is off.

Salt assignment is deterministic (hash of the full row, not rand()) so
re-runs and resume produce identical partitioning — same policy as
everything else in this engine.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt_col(df: DataFrame, salt: int) -> Column:
    """Deterministic per-row salt in [0, salt)."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt)).cast("int")


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    partial_aggs: dict[str, Column],
    final_aggs: dict[str, Column],
    salt: int = 16,
) -> DataFrame:
    """Two-phase skew-tolerant aggregation.

    ``partial_aggs``: name -> aggregate over the raw rows, evaluated per
    (keys, salt). ``final_aggs``: name -> aggregate over the partial
    rows, evaluated per keys. Example (count distinct convs per entity)::

        salted_agg(df, ["entity"],
                   {"convs": F.collect_set("conv")},
                   {"n_convs": F.size(F.array_distinct(F.flatten(F.collect_list("convs"))))})
    """
    partial = (
        df.withColumn("_salt", _salt_col(df, salt))
        .groupBy(*keys, "_salt")
        .agg(*[c.alias(n) for n, c in partial_aggs.items()])
    )
    return partial.groupBy(*keys).agg(*[c.alias(n) for n, c in final_aggs.items()])


def salted_count(df: DataFrame, keys: Sequence[str], out: str = "n", salt: int = 16) -> DataFrame:
    return salted_agg(
        df, keys,
        {"_pc": F.count(F.lit(1))},
        {out: F.sum("_pc").cast("long")},
        salt,
    )


def salted_join(
    big: DataFrame, small: DataFrame, key: str, salt: int = 16, how: str = "inner"
) -> DataFrame:
    """Join a skewed big side with a small side by spreading each key
    over ``salt`` sub-partitions. The small side is replicated ``salt``
    times (acceptable because it is small — that asymmetry is the
    precondition; if both sides are huge AND skewed, range-split the hot
    keys instead).

    Only join modes whose semantics survive small-side replication are
    accepted: inner/left/left_semi/left_anti (unmatched BIG rows appear
    once; unmatched SMALL rows never appear). 'right'/'full' would emit
    every unmatched small-side row ``salt`` times — rejected."""
    supported = {"inner", "left", "left_outer", "leftouter", "left_semi",
                 "leftsemi", "semi", "left_anti", "leftanti", "anti"}
    if how.lower() not in supported:
        raise ValueError(
            f"salted_join does not support how={how!r}: small-side "
            f"replication duplicates unmatched small rows under "
            f"right/full modes (supported: {sorted(supported)})"
        )
    big_s = big.withColumn("_salt", _salt_col(big, salt))
    small_s = small.crossJoin(
        F.broadcast(
            big.sparkSession.range(salt).select(F.col("id").cast("int").alias("_salt"))
        )
    )
    out = big_s.join(small_s, [key, "_salt"], how)
    return out.drop("_salt")
