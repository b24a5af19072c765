"""Leakage-safe train/validation/test splitting.

Hashing DOCUMENT ids into splits (the naive recipe) leaks: two
near-duplicate documents land on opposite sides of the split with
probability ``2·p·(1-p)``, and the eval set then measures
memorization of the training copy (the contamination mechanism
Lee et al. 2022 "Deduplicating Training Data Makes Language Models
Better" and the GPT-3 appendix both document). The fix is standard
but rarely implemented distributed: assign splits at the NEAR-DUP
CLUSTER level — every member of a connected component of the
similarity graph inherits the component's split — so a document and
all its near-copies are always on the same side.

:func:`leakage_safe_split` composes the repo's existing cluster
machinery (:func:`jena_spark.data.dedup.dedup_clusters` — the sameAs
connected-components path, proven at the entity graph's scale) with
the md5-threshold assignment of
:func:`jena_spark.data.selection.stratified_sample`: split =
first bucket whose cumulative integer threshold exceeds
``hash32(salt || cluster)``. Deterministic (re-running reassigns the
identical split), exact-integer comparisons, no ``rand()``.

Scale design: clustering cost is the pair graph's (bounded by the
caller's LSH/Jaccard candidate generation, never all-pairs); the
assignment itself is map-only over the cluster mapping. Singleton
documents (in no pair) are their own cluster, so the split of the
non-duplicated bulk is exactly the document-hash split.

No reference-twin: Jena has no corpus operators — LLM-data-pipeline
surface (SURVEY.md "beyond the reference" mandate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jena_spark.data.dedup import dedup_clusters
from jena_spark.data.selection import _HASH_SPAN, _hash32


def _thresholds(fractions: dict[str, float]) -> list[tuple[str, int]]:
    """(name, cumulative-threshold) pairs in insertion order; the last
    split absorbs the hash span's rounding remainder."""
    if not fractions:
        raise ValueError("fractions must name at least one split")
    total = sum(fractions.values())
    if any(f < 0 for f in fractions.values()) or abs(total - 1.0) > 1e-9:
        raise ValueError(
            f"fractions must be non-negative and sum to 1, got {fractions}")
    out, acc = [], 0.0
    names = list(fractions)
    for name in names[:-1]:
        acc += fractions[name]
        out.append((name, min(_HASH_SPAN, int(acc * _HASH_SPAN))))
    out.append((names[-1], _HASH_SPAN))
    return out


def leakage_safe_split(docs: DataFrame, pairs: DataFrame,
                       fractions: dict[str, float] | None = None,
                       id_col: str = "doc_id",
                       salt: str = "split") -> DataFrame:
    """Assign every document a split such that near-duplicates share it.

    ``pairs`` is a ``(doc_a, doc_b)`` near-dup pair frame (Jaccard,
    MinHash-LSH, SimHash, embedding — any of this repo's candidate
    generators). Returns ``(id_col, cluster, split)`` for EVERY doc in
    ``docs``; ``cluster`` is the min-id connected-component
    representative (singletons map to themselves), ``split`` the
    bucket of ``hash32(salt || cluster)`` under the cumulative
    thresholds of ``fractions`` (insertion order; default
    90/5/5 train/valid/test).
    """
    fractions = fractions or {"train": 0.90, "valid": 0.05, "test": 0.05}
    cuts = _thresholds(fractions)
    clusters = dedup_clusters(pairs, docs=docs, id_col=id_col) \
        .select(id_col, "cluster")
    h = _hash32(F.concat(F.lit(salt), F.col("cluster").cast("string")))
    split = F.lit(cuts[-1][0])
    for name, cut in reversed(cuts[:-1]):
        split = F.when(h < F.lit(cut), F.lit(name)).otherwise(split)
    return clusters.withColumn("split", split)


def split_case_sql(fractions: dict[str, float] | None = None,
                   salt: str = "split",
                   cluster_expr: str = "cluster") -> str:
    """DuckDB CASE expression mirroring the split assignment — compose
    with the caller's connected-components CTE (the
    ``data_dedup_clusters`` recursive recipe) for a full oracle."""
    fractions = fractions or {"train": 0.90, "valid": 0.05, "test": 0.05}
    cuts = _thresholds(fractions)
    h = (f"('0x' || substr(md5('{salt}' || CAST({cluster_expr} AS VARCHAR)),"
         f" 1, 8))::BIGINT")
    branches = "".join(
        f" WHEN {h} < {cut} THEN '{name}'" for name, cut in cuts[:-1])
    return f"CASE{branches} ELSE '{cuts[-1][0]}' END"
