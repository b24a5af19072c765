"""Sketch-based census ops for the training-data pipeline.

At 100 TB, exact ``COUNT(DISTINCT ...)`` is a full shuffle of every
distinct value; the operational censuses a data pipeline actually
runs — corpus cardinality dashboards, per-partition dedup-rate
monitoring, cross-snapshot growth tracking — want a **mergeable
sketch** instead: per-partition HLL sketches are tiny (KBs), exact to
within ~1-2%, and union without touching the data again. Spark ships
the Apache DataSketches HLL family as JVM aggregates
(``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate``) —
all JVM-side, zero Python on the data path.

The reference engine has only exact ``COUNT DISTINCT``
(``AggCountVarDistinct.java``; SURVEY §2.4 notes
``approx_count_distinct`` as the tolerable-scale mapping) — this
module is the "beyond the reference" scale path: the exact aggregate
stays the oracle-checked default, sketches are the monitoring/rollup
surface.

Mergeability is the point: ``sketch_by`` persists one sketch per
group/partition, and ``estimate_union`` answers any rollup over them
(per-day -> per-month, per-shard -> global) WITHOUT re-scanning the
corpus — the snapshot-census workflow of an append-only 10^12-turn
store. Accuracy and merge-consistency are property-tested
(``tests/test_sketches.py``): estimates within tolerance of exact, and
union-of-group-sketches ≈ whole-table sketch.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sketch_by(
    df: DataFrame, value: str | Column, group_by: list[str] | None = None,
    lg_k: int = 12,
) -> DataFrame:
    """One HLL sketch per group (or one row for the whole frame):
    ``group cols..., n_est (bigint), sketch (binary)``.

    The sketch column is the persistable artifact — write it next to
    the partition it describes and later rollups are metadata-sized.
    ``lg_k`` trades size for accuracy (2^lg_k registers; 12 -> ~1.6 KB,
    ~2% error)."""
    col = F.col(value) if isinstance(value, str) else value
    gb = df.groupBy(*(group_by or []))
    return gb.agg(
        F.hll_sketch_agg(col, F.lit(lg_k)).alias("sketch")
    ).select(
        *(group_by or []),
        # an empty (ungrouped) frame aggregates to one row with a NULL
        # sketch — the estimate of nothing is 0, not null (callers do
        # arithmetic on n_est)
        F.coalesce(F.hll_sketch_estimate("sketch"), F.lit(0)).alias("n_est"),
        "sketch",
    )


def estimate_union(sketches: DataFrame, group_by: list[str] | None = None) -> DataFrame:
    """Roll sketches up: union the ``sketch`` column per (coarser)
    group and estimate — the recount-free rollup. Input is any frame
    produced by :func:`sketch_by` (or a union of several)."""
    gb = sketches.groupBy(*(group_by or []))
    return gb.agg(
        F.hll_union_agg("sketch").alias("sketch")
    ).select(
        *(group_by or []),
        F.coalesce(F.hll_sketch_estimate("sketch"), F.lit(0)).alias("n_est"),
        "sketch",
    )


def distinct_estimate(df: DataFrame, value: str | Column, lg_k: int = 12) -> int:
    """Whole-frame distinct-cardinality estimate (one number)."""
    return sketch_by(df, value, lg_k=lg_k).collect()[0]["n_est"]
