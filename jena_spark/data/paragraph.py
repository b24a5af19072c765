"""Exact segment-level deduplication with document reconstruction.

The corpus-dedup complement to document-level dedup (``data/dedup.py``):
instead of dropping whole near-duplicate documents, remove REPEATED
PASSAGES across the corpus and stitch each document back together from
its surviving segments — the "exact substring deduplication" treatment
of Lee et al., *Deduplicating Training Data Makes Language Models
Better* (ACL 2022), restricted to segment boundaries so the operation
is exactly reproducible and SQL-oracle-able. Reference precedent for
the keep-first contract: Jena's ``GraphMem`` add-statement dedup keeps
the first-added statement (``jena-core/.../mem/GraphMem.java``); here
the total order is the deterministic (doc_id, pos), not arrival time.

Two segmentation modes:

* ``mode="para"`` — split on a separator regex (default blank line),
  the natural unit for prose corpora.
* ``mode="words"`` — non-overlapping ``k``-word windows, the unit for
  single-line token-stream corpora (the synthetic ``documents`` table)
  and the closest bounded analog of suffix-array substring dedup.

Keep-first policy: for every distinct segment, the occurrence with the
smallest ``(doc_id, pos)`` survives; all later occurrences (including
repeats inside one document) are removed. Documents are reassembled
from surviving segments in original position order; a document whose
segments all lose elsewhere comes back as the empty string (it stays a
row — the caller decides whether to drop empties).

Scale design (the part that matters at 100 TB):

* The duplicate decision is ``groupBy(key).agg(min(struct(doc_id,
  pos)))`` — a partial-aggregatable hash aggregate, so a boilerplate
  segment occurring 10^9 times collapses map-side and never skews the
  reduce (a window over ``partitionBy(key)`` would funnel all 10^9
  occurrences through one task; this is why the join formulation wins).
* The join back (occurrences ⨝ one-row-per-key winners) is the only
  skew-exposed edge; AQE skew-join splits it, and the build side is
  min-struct rows only.
* Segments shuffle as 128-bit ``md5`` keys, not text (``key="md5"``,
  the default) — collision-odds ~2^-64 at 10^12 segments and the
  shuffle carries 16 bytes instead of the passage. ``key="text"``
  keeps the exact-string key for the paranoid.
* Reassembly is one hash aggregate per document (``collect_list`` of
  (pos, seg) structs, sorted in-expression) — map-side combinable and
  bounded by document size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["segment_documents", "dedup_segments", "dedup_substrings"]


def segment_documents(df: DataFrame, *, doc_id: str = "doc_id",
                      text: str = "text", mode: str = "para",
                      sep: str = r"\n{2,}", k: int = 50) -> DataFrame:
    """-> (doc_id, pos, seg): one row per non-empty segment, ``pos``
    0-based in document order. ``mode="para"`` splits on the ``sep``
    regex; ``mode="words"`` emits non-overlapping ``k``-word windows
    (the last window may be short). Pure map-side — no shuffle."""
    if mode == "para":
        seg = F.posexplode(F.split(F.col(text), sep))
        out = (df.select(F.col(doc_id).alias("doc_id"),
                         seg.alias("pos", "seg"))
                 .where(F.trim("seg") != ""))
        return out.select("doc_id", "pos", F.col("seg").alias("seg"))
    if mode != "words":
        raise ValueError(f"unknown segmentation mode {mode!r}")
    words = F.split(F.trim(F.col(text)), r"\s+")
    n_seg = F.ceil(F.size(words) / F.lit(k)).cast("int")
    # slice() is 1-based; build each k-word window in-expression so the
    # word array is materialized once per row, never shuffled.
    segs = F.transform(
        F.sequence(F.lit(0), n_seg - 1),
        lambda i: F.array_join(F.slice(words, i * k + 1, k), " "))
    seg = F.posexplode(segs)
    return (df.select(F.col(doc_id).alias("doc_id"), seg.alias("pos", "seg"))
              .where(F.col("seg") != ""))


def dedup_segments(df: DataFrame, *, doc_id: str = "doc_id",
                   text: str = "text", mode: str = "para",
                   sep: str = r"\n{2,}", k: int = 50,
                   key: str = "md5") -> DataFrame:
    """-> one row per input document: ``clean_text`` (surviving
    segments re-joined), ``n_segs`` (original segment count),
    ``n_kept``. Keep-first by global (doc_id, pos); see module
    docstring for the policy and the scale argument."""
    if key not in ("md5", "text"):
        raise ValueError(f"unknown key mode {key!r}")
    segs = segment_documents(df, doc_id=doc_id, text=text, mode=mode,
                             sep=sep, k=k)
    kcol = (F.md5(F.col("seg")) if key == "md5" else F.col("seg"))
    occ = segs.withColumn("_k", kcol)
    winners = (occ.groupBy("_k")
                  .agg(F.min(F.struct("doc_id", "pos")).alias("_first")))
    kept = (occ.join(winners, "_k")
               .where((F.col("doc_id") == F.col("_first.doc_id"))
                      & (F.col("pos") == F.col("_first.pos")))
               .select("doc_id", "pos", "seg"))
    joiner = "\n\n" if mode == "para" else " "
    rebuilt = (kept.groupBy("doc_id")
                   .agg(F.array_join(
                            F.transform(
                                F.array_sort(F.collect_list(
                                    F.struct("pos", "seg"))),
                                lambda s: s["seg"]),
                            joiner).alias("clean_text"),
                        F.count("*").alias("n_kept")))
    totals = segs.groupBy("doc_id").agg(F.count("*").alias("n_segs"))
    base = df.select(F.col(doc_id).alias("doc_id")).distinct()
    return (base.join(totals, "doc_id", "left")
                .join(rebuilt, "doc_id", "left")
                .select("doc_id",
                        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
                        F.coalesce("n_segs", F.lit(0)).cast("bigint").alias("n_segs"),
                        F.coalesce("n_kept", F.lit(0)).cast("bigint").alias("n_kept")))


def dedup_substrings(df: DataFrame, *, doc_id: str = "doc_id",
                     text: str = "text", k: int = 20) -> DataFrame:
    """Exact-substring deduplication with span EXCISION — the
    unrestricted form of Lee et al.'s ExactSubstr treatment (ACL 2022
    §4.1: "remove from every document any substring of ≥k tokens that
    occurs elsewhere, keeping one occurrence"), where
    :func:`dedup_segments` is the boundary-aligned restriction.

    Every OVERLAPPING ``k``-word window of every document is hashed;
    for each distinct window the globally-smallest ``(doc_id, pos)``
    occurrence wins and all other occurrences LOSE. A word is excised
    iff it is covered by at least one losing window; each document is
    rebuilt from its surviving words in order (single-space joined —
    original inter-word whitespace is normalized, same contract as
    ``mode="words"`` segment dedup). Documents shorter than ``k``
    words have no windows and come back intact (normalized).

    Returns one row per input document:
    ``(doc_id, clean_text, n_words, n_removed)``.

    Scale design: window census is the same partial-aggregatable
    ``groupBy(md5).agg(min(struct))`` as segment dedup — a boilerplate
    passage occurring 10^9 times collapses map-side. Losing windows
    (and ONLY losers) explode ×k into covered word positions; the
    excision is a distinct + anti-join on (doc, pos), both shuffling
    16-byte keys. Reassembly is one sorted-collect hash aggregate per
    document, bounded by document length.
    """
    words = F.split(F.trim(F.col(text)), r"\s+")
    base = df.select(F.col(doc_id).alias("doc_id"), words.alias("_w")) \
             .where(F.element_at("_w", 1) != "")
    # one row per word, 0-based position
    wp = base.select("doc_id", F.posexplode("_w").alias("wpos", "word"))
    # one row per overlapping k-window: (doc_id, gpos, 128-bit key)
    gram_keys = F.transform(
        F.sequence(F.lit(0), F.size("_w") - F.lit(k)),
        lambda i: F.md5(F.array_join(F.slice("_w", i + 1, k), " ")))
    occ = (base.where(F.size("_w") >= k)
               .select("doc_id", F.posexplode(gram_keys).alias("gpos", "_k")))
    winners = (occ.groupBy("_k")
                  .agg(F.min(F.struct("doc_id", F.col("gpos").alias("pos")))
                       .alias("_first")))
    losers = (occ.join(winners, "_k")
                 .where((F.col("doc_id") != F.col("_first.doc_id"))
                        | (F.col("gpos") != F.col("_first.pos")))
                 .select("doc_id", "gpos"))
    covered = (losers.select(
                   "doc_id",
                   F.explode(F.sequence(F.col("gpos"),
                                        F.col("gpos") + (k - 1)))
                   .alias("wpos"))
                     .distinct())
    kept = wp.join(covered, ["doc_id", "wpos"], "left_anti")
    rebuilt = (kept.groupBy("doc_id")
                   .agg(F.array_join(
                            F.transform(
                                F.array_sort(F.collect_list(
                                    F.struct("wpos", "word"))),
                                lambda s: s["word"]),
                            " ").alias("clean_text"),
                        F.count("*").alias("n_kept")))
    totals = wp.groupBy("doc_id").agg(F.count("*").alias("n_words"))
    ids = df.select(F.col(doc_id).alias("doc_id")).distinct()
    return (ids.join(totals, "doc_id", "left")
               .join(rebuilt, "doc_id", "left")
               .select("doc_id",
                       F.coalesce("clean_text", F.lit("")).alias("clean_text"),
                       F.coalesce("n_words", F.lit(0)).cast("bigint")
                        .alias("n_words"),
                       (F.coalesce("n_words", F.lit(0))
                        - F.coalesce("n_kept", F.lit(0))).cast("bigint")
                       .alias("n_removed")))
