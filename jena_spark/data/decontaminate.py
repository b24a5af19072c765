"""Train/test decontamination — benchmark n-gram overlap flagging.

The standard LLM-corpus hygiene pass (GPT-3 appendix C, PaLM, Llama
reports): a training document is CONTAMINATED when it shares any
normalized word n-gram (8-13 words in the literature) with any
evaluation-benchmark instance. This is the batch twin of the
near-dedup family in :mod:`jena_spark.data.dedup` — same inverted
posture, but one side is tiny and known in advance.

Scale design (100 TB corpus vs ~10^5-10^6 benchmark instances): the
benchmark n-gram set is minuscule next to the corpus, so it is
deduplicated and BROADCAST; the corpus side explodes to (doc, gram)
rows only within the map-side hash semi-join against the broadcast
set — the corpus is never shuffled, and the only aggregation is the
per-doc hit count (map-side partial combine). ``hash_grams=True``
ships 8-byte ``xxhash64`` keys instead of gram strings in the
broadcast (the bloom-filter posture of the published pipelines, minus
the false positives — collisions at 2^64 are negligible and the check
is one-sided anyway); the default keeps exact strings so results are
oracle-comparable.

No reference-twin: Jena has no corpus operator family — this extends
the repo's LLM-data-pipeline surface (SURVEY.md "beyond the
reference" mandate) alongside dedup/curation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: normalization: lowercase, non-alphanumeric runs -> single space.
_NORM_RE = "[^a-z0-9]+"


def _words(text_col: Column) -> Column:
    return F.split(
        F.trim(F.regexp_replace(F.lower(text_col), _NORM_RE, " ")), " ")


def _raw_ngrams(df: DataFrame, id_col: str, text_col: str, n: int,
                out: str = "gram") -> DataFrame:
    """(id, gram) rows WITH positional duplicates — map-only."""
    words = _words(F.col(text_col))
    d = df.select(F.col(id_col), words.alias("_w")).where(F.size("_w") >= n)
    # starts 0..len-n, each sliced back out as a space-joined gram; the
    # >=n guard above keeps the sequence ascending (a descending
    # sequence is valid Spark and would silently emit garbage grams)
    grams = F.transform(
        F.sequence(F.lit(0), F.size("_w") - F.lit(n)),
        lambda i: F.array_join(F.slice("_w", i + F.lit(1), n), " "),
    )
    return d.select(id_col, F.explode(grams).alias(out))


def ngrams(df: DataFrame, id_col: str, text_col: str, n: int,
           out: str = "gram") -> DataFrame:
    """(id, gram) rows — every normalized word ``n``-gram of every
    document, DISTINCT per document (one shared gram counts once).
    Documents shorter than ``n`` words produce no rows."""
    return _raw_ngrams(df, id_col, text_col, n, out).distinct()


def _gram_set(df: DataFrame, text_col: str, n: int) -> DataFrame:
    """DISTINCT normalized word n-grams of every row — the broadcast
    side of a contamination check."""
    return (
        df.select(_words(F.col(text_col)).alias("_w"))
        .where(F.size("_w") >= n)
        .select(F.explode(F.transform(
            F.sequence(F.lit(0), F.size("_w") - F.lit(n)),
            lambda i: F.array_join(F.slice("_w", i + F.lit(1), n), " "),
        )).alias("gram"))
        .distinct()
    )


def decontaminate(docs: DataFrame, benchmark: DataFrame, n: int = 8,
                  doc_id: str = "doc_id", text: str = "text",
                  bench_text: str = "text",
                  hash_grams: bool = False) -> DataFrame:
    """Annotate ``docs`` with benchmark-overlap contamination.

    Returns one row per input document: ``(doc_id,
    n_contaminated_grams, contaminated)`` where the count is the
    number of DISTINCT document n-grams that appear anywhere in the
    benchmark, and ``contaminated`` is the GPT-3-style any-overlap
    flag. ``benchmark`` only needs ``bench_text``.
    """
    bench_grams = _gram_set(benchmark, bench_text, n)
    # the corpus side stays MAP-ONLY up to the broadcast join: raw
    # (doc, gram) rows filter against the broadcast set first, and only
    # the HITS (bounded by contamination volume, not corpus volume) are
    # deduplicated per (doc, gram) and counted — a pre-join distinct
    # would shuffle every corpus gram
    doc_grams = _raw_ngrams(docs, doc_id, text, n)
    if hash_grams:
        bench_grams = bench_grams.select(F.xxhash64("gram").alias("gram"))
        doc_grams = doc_grams.select(
            doc_id, F.xxhash64("gram").alias("gram"))
    hits = (doc_grams.join(F.broadcast(bench_grams), "gram")
            .select(doc_id, "gram").distinct()
            .groupBy(doc_id)
            .agg(F.count("*").alias("n_contaminated_grams")))
    return docs.select(doc_id).join(hits, doc_id, "left").select(
        doc_id,
        F.coalesce("n_contaminated_grams", F.lit(0)).cast("long")
        .alias("n_contaminated_grams"),
        (F.coalesce("n_contaminated_grams", F.lit(0)) > 0)
        .alias("contaminated"),
    )


def decontaminate_fraction(docs: DataFrame, benchmark: DataFrame,
                           n: int = 8, threshold_bp: int = 7000,
                           doc_id: str = "doc_id", text: str = "text",
                           bench_text: str = "text") -> DataFrame:
    """PaLM-style fractional contamination ("seen documents"): a
    document is contaminated when at least ``threshold_bp``/10000 of
    its DISTINCT word n-grams appear in the benchmark (the PaLM report
    used 70% of 8-grams; GPT-3's any-overlap flag is the
    ``threshold_bp -> 1 gram`` limit implemented by
    :func:`decontaminate`).

    Returns one row per document: ``(doc_id, n_contaminated_grams,
    total_grams, frac_bp, contaminated)``. ``frac_bp`` is the floored
    basis-point fraction (integer arithmetic — engine-portable), and
    the flag is the EXACT integer inequality
    ``hits * 10000 >= threshold_bp * total`` (never a float compare).
    Documents shorter than ``n`` words have ``total_grams = 0`` and
    are never contaminated.

    Scale design: identical to :func:`decontaminate` — broadcast
    benchmark grams, map-only corpus side — plus one observation that
    keeps the denominator free: a document's grams all live in ITS OWN
    row, so ``total_grams = size(array_distinct(grams))`` is computed
    per row before any explode. The denominator costs zero shuffle;
    the corpus is still never shuffled by gram.
    """
    bench_grams = _gram_set(benchmark, bench_text, n)
    words = _words(F.col(text))
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(words) - F.lit(n), F.lit(0))),
        lambda i: F.array_join(F.slice(words, i + F.lit(1), n), " "),
    )
    totals = docs.select(
        F.col(doc_id),
        F.when(F.size(words) >= n,
               F.size(F.array_distinct(grams)))
        .otherwise(F.lit(0)).cast("long").alias("total_grams"))
    doc_grams = _raw_ngrams(docs, doc_id, text, n)
    hits = (doc_grams.join(F.broadcast(bench_grams), "gram")
            .select(doc_id, "gram").distinct()
            .groupBy(doc_id)
            .agg(F.count("*").alias("_h")))
    return (totals.join(hits, doc_id, "left")
            .select(
                doc_id,
                F.coalesce("_h", F.lit(0)).cast("long")
                .alias("n_contaminated_grams"),
                "total_grams")
            .select(
                doc_id, "n_contaminated_grams", "total_grams",
                F.when(F.col("total_grams") > 0,
                       F.expr("n_contaminated_grams * 10000 "
                              "div total_grams"))
                .otherwise(F.lit(0)).cast("long").alias("frac_bp"),
                ((F.col("total_grams") > 0)
                 & (F.col("n_contaminated_grams") * 10000
                    >= F.lit(int(threshold_bp)) * F.col("total_grams")))
                .alias("contaminated")))


def decontaminate_semantic(corpus: DataFrame, benchmark: DataFrame,
                           threshold: float = 0.95,
                           id_col: str = "vec_id",
                           vec_col: str = "embedding",
                           bench_vec: str = "embedding") -> DataFrame:
    """Embedding-space decontamination — the semantic twin of the
    n-gram overlap flag (the "fuzzy contamination" check of the newer
    eval-hygiene literature: a training item is suspect when it is a
    near-paraphrase of a benchmark item even with zero shared n-grams).

    Flags every corpus vector whose max cosine against ANY benchmark
    vector reaches ``threshold``. Returns one row per corpus vector:
    ``(id, max_cos_r, contaminated)`` — ``max_cos_r`` rounded to 4
    decimals for engine-portable comparison; the flag compares the
    unrounded maximum.

    Scale design: benchmark suites are 10^4-10^6 vectors against a
    10^10-document corpus, so the benchmark side is BROADCAST and the
    corpus side is map-only expand → per-id max (partial-agg combine
    collapses each corpus partition to one row per id before the
    shuffle). The corpus is never shuffled by vector. For benchmark
    sets too large to broadcast, pre-bucket both sides with the IVF
    cells of :mod:`jena_spark.data.similarity` and run this per cell.
    """
    b = benchmark.select(
        F.transform(bench_vec, lambda x: x.cast("double")).alias("_bv"))
    c = corpus.select(F.col(id_col),
                      F.transform(vec_col,
                                  lambda x: x.cast("double")).alias("_cv"))
    from jena_spark.data.dedup import cosine

    scored = (c.crossJoin(F.broadcast(b))
               .groupBy(id_col)
               .agg(F.max(cosine(F.col("_cv"), F.col("_bv")))
                    .alias("_mc")))
    return scored.select(
        id_col,
        F.round("_mc", 4).alias("max_cos_r"),
        (F.col("_mc") >= F.lit(threshold)).cast("int")
        .alias("contaminated"))


def decontaminate_conversations(turns: DataFrame, benchmark: DataFrame,
                                n: int = 8,
                                conv_id: str = "conv_id",
                                text: str = "text",
                                role_col: str = "role",
                                roles: tuple[str, ...] = ("assistant",),
                                bench_text: str = "text") -> DataFrame:
    """Conversation-corpus decontamination — the transcript twin of
    :func:`decontaminate` (the same prerelease hygiene pass, applied
    to SFT/agent corpora: a conversation whose ASSISTANT output
    overlaps an eval instance teaches the model the benchmark).

    A conversation is contaminated when any of its ``roles`` turns
    shares a normalized word n-gram with any benchmark instance.
    Grams are computed PER TURN and never span turn boundaries —
    leakage is a copied utterance, not an artifact of concatenation
    order (and the per-turn frame is exactly what the one-shot
    :func:`decontaminate` sees for a document).

    Returns one row per DISTINCT conversation: ``(conv_id,
    n_contaminated_grams, contaminated)`` — the count is distinct
    contaminated grams ACROSS the conversation's matched turns.

    Scale shape is inherited: benchmark grams dedup + broadcast; the
    turn side is map-only explode → broadcast semi-join; only hits
    reach the per-conv aggregation. The verdict frame adds one
    distinct over conv ids — the output key set, already the
    conversation table's natural partitioning.
    """
    bench_grams = _gram_set(benchmark, bench_text, n)
    scoped = turns.where(F.col(role_col).isin(*roles))
    turn_grams = _raw_ngrams(scoped, conv_id, text, n)
    hits = (turn_grams.join(F.broadcast(bench_grams), "gram")
            .select(conv_id, "gram").distinct()
            .groupBy(conv_id)
            .agg(F.count("*").alias("n_contaminated_grams")))
    return turns.select(conv_id).distinct().join(hits, conv_id, "left") \
        .select(
            conv_id,
            F.coalesce("n_contaminated_grams", F.lit(0)).cast("long")
            .alias("n_contaminated_grams"),
            (F.coalesce("n_contaminated_grams", F.lit(0)) > 0)
            .alias("contaminated"))
