"""Classic web-corpus filter batteries: Gopher rules and C4 filters.

* :func:`gopher_rules` — the Gopher quality heuristics (Rae et al.
  2021, "Scaling Language Models: ...", Appendix A1.1): word-count
  band, mean-word-length band, symbol-to-word ratio, bullet-line and
  ellipsis-line fractions, alphabetic-word fraction, required-stopword
  presence. One row per document with every measured signal, a
  per-rule boolean, and the conjunctive verdict.
* :func:`c4_filters` — the C4 cleaning pass (Raffel et al. 2020,
  "Exploring the Limits of Transfer Learning...", §2.2): per-LINE
  retention (terminal punctuation, minimum words, no "javascript"),
  then per-PAGE verdict (minimum sentences in the retained text, no
  "lorem ipsum", no curly brace). Returns the cleaned text alongside
  the verdict — the operator's product is the filtered corpus, not
  just a flag.

Both are single-pass, map-only column expressions (split / filter /
transform / regexp inside whole-stage codegen — zero shuffle, zero
Python), so at 100 TB they cost one scan fused with whatever else the
curation pipeline computes. All arithmetic is deliberately
expressible in ANSI SQL; the DuckDB oracles in the registry evaluate
the identical formulas (ratios rounded to 6dp on both sides before
thresholding, the ``data_pii_redaction`` precedent).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Gopher's required-stopword set (App. A1.1: "contains at least two
#: of the following English words: the, be, to, of, and, that, have,
#: with").
GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")


def _r6(c: Column) -> Column:
    return F.round(c, 6)


def gopher_rules(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    min_words: int = 50, max_words: int = 100_000,
    min_mean_word_len: float = 3.0, max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1, max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3, min_alpha_frac: float = 0.8,
    min_required_stops: int = 2,
) -> DataFrame:
    """Per-document Gopher rule verdicts. Thresholds default to the
    paper's; the signals:

    - ``n_words``: whitespace tokens; ``mean_word_len`` = non-space
      chars / words (identical to the mean of token lengths under
      whitespace tokenization).
    - ``symbol_ratio``: (# ``#`` + # ``...``/``…``) per word.
    - ``bullet_frac`` / ``ellipsis_frac``: fraction of NON-EMPTY lines
      starting with a bullet (•, -, *) / ending with an ellipsis.
    - ``alpha_frac``: fraction of words containing an alphabetic char.
    - ``n_required_stops``: how many DISTINCT members of
      :data:`GOPHER_STOPS` appear as whole words.
    """
    t = F.col(text_col)
    n_words = F.when(F.length(F.trim(t)) == 0, F.lit(0)).otherwise(
        F.size(F.split(F.trim(t), r"\s+")))
    mean_wl = F.when(n_words == 0, F.lit(0.0)).otherwise(
        F.length(F.regexp_replace(t, r"\s", "")).cast("double")
        / n_words.cast("double"))
    n_sym = (
        F.size(F.regexp_extract_all(t, F.lit(r"#"), F.lit(0)))
        + F.size(F.regexp_extract_all(t, F.lit(r"\.\.\.|…"), F.lit(0))))
    symbol_ratio = F.when(n_words == 0, F.lit(0.0)).otherwise(
        n_sym.cast("double") / n_words.cast("double"))
    lines = F.filter(
        F.transform(F.split(t, "\n"), lambda x: F.trim(x)),
        lambda x: F.length(x) > 0)
    n_lines = F.size(lines)
    n_bullet = F.size(F.filter(lines, lambda x: x.rlike(r"^[•\-*]")))
    n_ellip = F.size(F.filter(lines, lambda x: x.rlike(r"(\.\.\.|…)$")))
    bullet_frac = F.when(n_lines == 0, F.lit(0.0)).otherwise(
        n_bullet.cast("double") / n_lines.cast("double"))
    ellipsis_frac = F.when(n_lines == 0, F.lit(0.0)).otherwise(
        n_ellip.cast("double") / n_lines.cast("double"))
    words = F.filter(
        F.split(F.trim(t), r"\s+"), lambda x: F.length(x) > 0)
    n_alpha = F.size(F.filter(words, lambda x: x.rlike(r"[A-Za-z]")))
    alpha_frac = F.when(n_words == 0, F.lit(0.0)).otherwise(
        n_alpha.cast("double") / n_words.cast("double"))
    low = F.lower(t)
    n_stops = sum(
        (F.when(low.rlike(r"\b" + s + r"\b"), 1).otherwise(0)
         for s in GOPHER_STOPS),
        start=F.lit(0))

    out = docs.select(
        F.col(id_col),
        n_words.alias("n_words"),
        _r6(mean_wl).alias("mean_word_len"),
        _r6(symbol_ratio).alias("symbol_ratio"),
        _r6(bullet_frac).alias("bullet_frac"),
        _r6(ellipsis_frac).alias("ellipsis_frac"),
        _r6(alpha_frac).alias("alpha_frac"),
        n_stops.alias("n_required_stops"),
    )
    rules = {
        "words_ok": (F.col("n_words") >= min_words)
        & (F.col("n_words") <= max_words),
        "mwl_ok": (F.col("mean_word_len") >= min_mean_word_len)
        & (F.col("mean_word_len") <= max_mean_word_len),
        "symbol_ok": F.col("symbol_ratio") <= max_symbol_ratio,
        "bullet_ok": F.col("bullet_frac") <= max_bullet_frac,
        "ellipsis_ok": F.col("ellipsis_frac") <= max_ellipsis_frac,
        "alpha_ok": F.col("alpha_frac") >= min_alpha_frac,
        "stops_ok": F.col("n_required_stops") >= min_required_stops,
    }
    for name, cond in rules.items():
        out = out.withColumn(name, cond)
    verdict = None
    for name in rules:
        verdict = F.col(name) if verdict is None else verdict & F.col(name)
    return out.withColumn("gopher_ok", verdict)


def c4_filters(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    min_words_per_line: int = 3, min_sentences: int = 5,
) -> DataFrame:
    """C4 cleaning (§2.2): keep lines that end in terminal punctuation
    (``.!?"``), have at least ``min_words_per_line`` words, and don't
    mention "javascript"; then judge the page — at least
    ``min_sentences`` sentence-final marks in the retained text, no
    "lorem ipsum", no curly brace anywhere on the page.

    Returns ``(id_col, n_lines, n_kept, n_sentences, c4_ok,
    clean_text)`` where ``clean_text`` is the retained lines rejoined
    with newlines (empty string when nothing survives).
    """
    t = F.col(text_col)
    lines = F.transform(F.split(t, "\n"), lambda x: F.trim(x))
    kept = F.filter(
        lines,
        lambda x: x.rlike(r"[.!?\"]$")
        & (F.size(F.split(x, r"\s+")) >= min_words_per_line)
        & ~F.lower(x).contains("javascript"))
    clean = F.array_join(kept, "\n")
    n_sent = F.size(F.regexp_extract_all(clean, F.lit(r"[.!?]"), F.lit(0)))
    low = F.lower(t)
    ok = ((n_sent >= min_sentences)
          & ~low.contains("lorem ipsum")
          & ~t.contains("{"))
    return docs.select(
        F.col(id_col),
        F.size(F.filter(lines, lambda x: F.length(x) > 0)).alias("n_lines"),
        F.size(kept).alias("n_kept"),
        n_sent.alias("n_sentences"),
        ok.alias("c4_ok"),
        clean.alias("clean_text"),
    )


def gopher_repetition(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    max_dup_line_frac: float = 0.30, max_dup_para_frac: float = 0.30,
    max_dup_line_char_frac: float = 0.20,
    max_dup_para_char_frac: float = 0.20,
    max_top_ngram_char_frac: tuple = (0.20, 0.18, 0.16),      # n = 2,3,4
    max_dup_ngram_char_frac: tuple = (0.15, 0.14, 0.13,
                                      0.12, 0.11, 0.10),      # n = 5..10
) -> DataFrame:
    """The Gopher repetitious-text battery (Rae et al. 2021, Appendix
    A1.2): duplicate line / paragraph fractions, duplicate line /
    paragraph CHARACTER fractions, top n-gram character fraction for
    n=2..4, duplicate n-gram character fraction for n=5..10 — plus the
    conjunctive ``rep_ok`` verdict at the paper's thresholds.

    Pinned definitions (engine-independent, mirrored in the oracle):

    - lines split on ``\\n``, paragraphs on ``\\n\\n`` (trimmed,
      empties dropped); a value occurring k times contributes k-1
      duplicate instances — char fractions count the characters of the
      k-1 REPEATED occurrences (``total - distinct``), over
      ``length(text)``.
    - n-grams are whitespace words joined by single spaces;
      ``top_{n}gram_char_frac`` is ``count*length`` of the most
      frequent gram (ties: longer gram, then lexicographic),
      ``dup_{n}gram_char_frac`` sums ``count*length`` over grams
      occurring more than once (overlaps NOT deduplicated — the
      Dolma-style approximation of the paper's position-marked
      coverage, capped at 1.0), both over ``length(text)``.

    Plan shape: the line/paragraph family is pure per-document array
    arithmetic — zero shuffle, fused into the scan. The n-gram family
    is ONE explode over all n (2..10) with map-side combine, so the
    shuffle carries one row per distinct ``(doc, n, gram)``; at 100 TB
    that is the same single-pass posture as
    :func:`jena_spark.data.text.repetition_stats`.
    """
    from pyspark.sql import Window

    t = F.col(text_col)

    def _dup_fracs(parts: Column, prefix: str) -> list[Column]:
        n_all = F.size(parts)
        n_dis = F.size(F.array_distinct(parts))
        chars = lambda arr: F.aggregate(  # noqa: E731
            arr, F.lit(0), lambda s, x: s + F.length(x))
        c_all = chars(parts)
        c_dis = chars(F.array_distinct(parts))
        frac = F.when(n_all == 0, F.lit(0.0)).otherwise(
            (n_all - n_dis).cast("double") / n_all.cast("double"))
        cfrac = F.when(F.length(t) == 0, F.lit(0.0)).otherwise(
            (c_all - c_dis).cast("double") / F.length(t).cast("double"))
        return [F.round(frac, 6).alias(f"dup_{prefix}_frac"),
                F.round(cfrac, 6).alias(f"dup_{prefix}_char_frac")]

    lines = F.filter(F.transform(F.split(t, "\n"), lambda x: F.trim(x)),
                     lambda x: F.length(x) > 0)
    paras = F.filter(F.transform(F.split(t, r"\n\s*\n"),
                                 lambda x: F.trim(x)),
                     lambda x: F.length(x) > 0)
    base = docs.select(
        F.col(id_col), F.length(t).alias("n_chars"),
        *_dup_fracs(lines, "line"), *_dup_fracs(paras, "para"))

    # One token explode + ONE lead-window pass yields every gram size
    # at once (gram_n at a position = word || lead(1..n-1)); nesting
    # nine word_ngrams() array expressions instead blows past the
    # codegen method limit and falls back to interpreted eval
    # (measured 40s -> ~3s at sf0.1). The shuffle carries the corpus
    # as tokens exactly once — the BPE word-census posture.
    toks = docs.select(
        F.col(id_col),
        F.posexplode(F.filter(F.split(F.trim(t), r"\s+"),
                              lambda x: F.length(x) > 0))
        .alias("pos", "word"))
    w_ord = Window.partitionBy(id_col).orderBy("pos")
    led = toks.select(
        F.col(id_col), F.col("word"),
        *[F.lead("word", k).over(w_ord).alias(f"l{k}")
          for k in range(1, 10)])
    gram_structs = F.array(*[
        F.struct(
            F.lit(n).alias("n"),
            F.when(F.col(f"l{n - 1}").isNotNull(),
                   F.concat_ws(" ", F.col("word"),
                               *[F.col(f"l{k}") for k in range(1, n)]))
            .alias("gram"))
        for n in range(2, 11)])
    grams = (
        led.select(F.col(id_col), F.explode(gram_structs).alias("g"))
        .select(id_col, F.col("g.n").alias("n"),
                F.col("g.gram").alias("gram"))
        .where(F.col("gram").isNotNull()))
    counted = grams.groupBy(id_col, "n", "gram").agg(
        F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy(id_col, "n").orderBy(
        F.desc("c"), F.desc(F.length("gram")), F.asc("gram"))
    per_n = (
        counted.withColumn("rk", F.row_number().over(w))
        .groupBy(id_col, "n")
        .agg(
            F.max(F.when(F.col("rk") == 1,
                         F.col("c") * F.length("gram"))).alias("top_chars"),
            F.coalesce(F.sum(F.when(F.col("c") > 1,
                                    F.col("c") * F.length("gram"))),
                       F.lit(0)).alias("dup_chars"),
        ))
    agg_cols = []
    for n in (2, 3, 4):
        agg_cols.append(F.max(F.when(F.col("n") == n, F.col("top_chars")))
                        .alias(f"top_{n}"))
    for n in range(5, 11):
        agg_cols.append(F.max(F.when(F.col("n") == n, F.col("dup_chars")))
                        .alias(f"dup_{n}"))
    pivoted = per_n.groupBy(id_col).agg(*agg_cols)

    out = base.join(pivoted, id_col, "left")
    frac = lambda c: F.round(  # noqa: E731
        F.least(F.coalesce(c, F.lit(0)).cast("double")
                / F.greatest(F.col("n_chars"), F.lit(1)).cast("double"),
                F.lit(1.0)), 6)
    for n in (2, 3, 4):
        out = out.withColumn(f"top_{n}gram_char_frac",
                             frac(F.col(f"top_{n}")))
    for n in range(5, 11):
        out = out.withColumn(f"dup_{n}gram_char_frac",
                             frac(F.col(f"dup_{n}")))
    checks = (
        (F.col("dup_line_frac") <= max_dup_line_frac)
        & (F.col("dup_para_frac") <= max_dup_para_frac)
        & (F.col("dup_line_char_frac") <= max_dup_line_char_frac)
        & (F.col("dup_para_char_frac") <= max_dup_para_char_frac))
    for n, thr in zip((2, 3, 4), max_top_ngram_char_frac):
        checks = checks & (F.col(f"top_{n}gram_char_frac") <= thr)
    for n, thr in zip(range(5, 11), max_dup_ngram_char_frac):
        checks = checks & (F.col(f"dup_{n}gram_char_frac") <= thr)
    drop = ["n_chars"] + [f"top_{n}" for n in (2, 3, 4)] + [
        f"dup_{n}" for n in range(5, 11)]
    return out.withColumn("rep_ok", checks).drop(*drop)


#: Placeholder blocklist — MILD terms only. The C4 paper's actual
#: filter uses the "List of Dirty, Naughty, Obscene or Otherwise Bad
#: Words" (github.com/LDNOOBW); deployments supply that list via the
#: ``words`` parameter. Kept tiny here so tests stay printable.
DEFAULT_BADWORDS: tuple[str, ...] = (
    "damn", "crap", "sucks", "stupid", "idiot", "shut up")

_BADWORD_TOKEN = __import__("re").compile(r"^[a-z0-9]+( [a-z0-9]+)*$")


def badwords_regex(words: tuple[str, ...]) -> str:
    """One word-boundary alternation over the (validated) blocklist.
    Every entry must be lowercase ``\\w+`` tokens optionally joined by
    single spaces — the SAFE_SURFACES discipline, so the alternation
    is regex-injection-proof and byte-identical across engines."""
    if not words:
        raise ValueError("blocklist must name at least one word")
    for w in words:
        if not _BADWORD_TOKEN.match(w):
            raise ValueError(
                f"blocklist entry {w!r} must be lowercase word tokens "
                f"(optionally space-joined)")
    return r"\b(" + "|".join(words) + r")\b"


def badwords_filter(docs: DataFrame, words: tuple[str, ...] = DEFAULT_BADWORDS,
                    text_col: str = "text", id_col: str = "doc_id",
                    max_hits: int = 0) -> DataFrame:
    """C4's blocklist pass (Raffel et al. 2020 §2.2: "remove any page
    that contains any word on the ... blocklist").

    Returns ``(id_col, n_bad_hits, n_bad_distinct, bw_ok)`` — total
    blocklist occurrences, distinct blocklist terms present, and the
    verdict ``n_bad_hits <= max_hits`` (the paper's rule is
    ``max_hits=0``; a small positive budget tolerates quoted or
    clinical uses). Case-insensitive, word-boundary anchored — "crap"
    never fires inside "scrapbook".

    Map-only: one combined regex inside whole-stage codegen, zero
    shuffle, zero Python — at 100 TB this fuses into the same scan as
    the other C4/Gopher signals.
    """
    rx = badwords_regex(words)
    low = F.lower(F.col(text_col))
    hits = F.regexp_extract_all(low, F.lit(rx), F.lit(1))
    return docs.select(
        F.col(id_col),
        F.size(hits).cast("long").alias("n_bad_hits"),
        F.size(F.array_distinct(hits)).cast("long").alias("n_bad_distinct"),
        (F.size(hits) <= int(max_hits)).cast("int").alias("bw_ok"))


def badwords_sql(words: tuple[str, ...] = DEFAULT_BADWORDS,
                 docs_cte: str = "SELECT doc_id, text FROM documents",
                 max_hits: int = 0) -> str:
    """DuckDB twin of :func:`badwords_filter` — the identical
    alternation, so the frame hash-matches."""
    rx = badwords_regex(words).replace("'", "''")
    return f"""WITH src AS ({docs_cte}),
h AS (
  SELECT doc_id,
         regexp_extract_all(lower(text), '{rx}', 1) AS hits
  FROM src)
SELECT doc_id,
       CAST(len(hits) AS BIGINT) AS n_bad_hits,
       CAST(len(list_distinct(hits)) AS BIGINT) AS n_bad_distinct,
       CAST(len(hits) <= {int(max_hits)} AS INT) AS bw_ok
FROM h"""
