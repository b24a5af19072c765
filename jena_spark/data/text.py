"""Text analysis: tokenization, quality scoring, language ID,
document fingerprinting.

All formulas are deliberately expressible in both Spark SQL and ANSI
SQL (the DuckDB oracle runs the identical arithmetic) — the point is
deterministic, engine-independent semantics, not model quality.
Everything below is JVM-side (split/regexp/aggregate inside
whole-stage codegen); no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword lists for the n-gram/stopword heuristic
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "is", "of", "to", "a", "in", "that", "it", "for"],
    "fr": ["le", "la", "et", "est", "de", "un", "une", "dans", "que", "pour"],
    "de": ["der", "die", "und", "ist", "von", "zu", "ein", "eine", "das", "mit"],
}


def tokens(text: Column) -> Column:
    """Whitespace tokenization (split on runs of whitespace)."""
    return F.split(F.trim(text), r"\s+")


def token_count(text: Column) -> Column:
    return F.when(F.length(F.trim(text)) == 0, F.lit(0)).otherwise(
        F.size(tokens(text))
    )


def bpe_ish_token_count(text: Column) -> Column:
    """Sub-word-ish count: word pieces + digits + punctuation as units
    (a deterministic BPE stand-in: ~4 chars/token heuristic blended
    with word boundaries)."""
    words = F.size(F.regexp_extract_all(text, F.lit(r"[A-Za-z]+|[0-9]|[^\sA-Za-z0-9]"), F.lit(0)))
    return words + (F.length(text) / F.lit(16)).cast("int")


def punct_ratio(text: Column) -> Column:
    n = F.length(text)
    p = F.length(F.regexp_replace(text, r"[^.,;:!?'\"()\[\]{}-]", ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(p.cast("double") / n.cast("double"))


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    sw = LANG_STOPWORDS[lang]
    pat = r"\b(" + "|".join(sw) + r")\b"
    hits = F.size(F.regexp_extract_all(F.lower(text), F.lit(pat), F.lit(0)))
    tc = token_count(text)
    return F.when(tc == 0, F.lit(0.0)).otherwise(hits.cast("double") / tc.cast("double"))


def quality_score(text: Column) -> Column:
    """Composite quality in [0,1]: length band + low punct + stopword
    presence. Formula (fixed, engine-independent):
    0.4*min(len/500,1) + 0.3*(1-min(punct_ratio*5,1)) + 0.3*min(stop_ratio*5,1)."""
    len_term = F.least(F.length(text).cast("double") / 500.0, F.lit(1.0))
    punct_term = 1.0 - F.least(punct_ratio(text) * 5.0, F.lit(1.0))
    stop_term = F.least(stopword_ratio(text) * 5.0, F.lit(1.0))
    return F.round(0.4 * len_term + 0.3 * punct_term + 0.3 * stop_term, 6)


def quality_score_bp(text: Column) -> Column:
    """Integer-exact quality in basis points [0, 10000] — the same
    shape as :func:`quality_score` but computed entirely in integer
    arithmetic (floor division), so any engine reproduces it
    bit-for-bit with no float-rounding boundary cases:

    ``4*min(2*len, 1000) + 3*(1000 - min(5000*punct div len, 1000))
    + 3*min(5000*stop_hits div n_tokens, 1000)``
    """
    n = F.length(text).cast("long")
    p = F.length(
        F.regexp_replace(text, r"[^.,;:!?'\"()\[\]{}-]", "")
    ).cast("long")
    sw = LANG_STOPWORDS["en"]
    pat = r"\b(" + "|".join(sw) + r")\b"
    hits = F.size(F.regexp_extract_all(F.lower(text), F.lit(pat), F.lit(0))).cast("long")
    tc = token_count(text).cast("long")
    len_term = F.least(F.lit(2) * n, F.lit(1000))
    punct_term = F.lit(1000) - F.when(n == 0, F.lit(0)).otherwise(
        F.least(F.lit(5000) * p - ((F.lit(5000) * p) % n), F.lit(1000) * n) / n
    ).cast("long")
    stop_term = F.when(tc == 0, F.lit(0)).otherwise(
        F.least(F.lit(5000) * hits - ((F.lit(5000) * hits) % tc), F.lit(1000) * tc) / tc
    ).cast("long")
    return (F.lit(4) * len_term + F.lit(3) * punct_term + F.lit(3) * stop_term).cast("long")


def lang_scores(text: Column) -> list[tuple[str, Column]]:
    out = []
    for lang in sorted(LANG_STOPWORDS):
        sw = LANG_STOPWORDS[lang]
        pat = r"\b(" + "|".join(sw) + r")\b"
        out.append((lang, F.size(F.regexp_extract_all(F.lower(text), F.lit(pat), F.lit(0)))))
    return out


def lang_id(text: Column) -> Column:
    """argmax over per-language stopword hit counts; ties broken by
    language code order; 'und' when nothing hits."""
    scores = lang_scores(text)
    best_lang = F.lit("und")
    best_score = F.lit(0)
    for lang, score in scores:  # later wins only on strictly greater
        is_better = score > best_score
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(is_better, score).otherwise(best_score)
    return best_lang


def word_ngrams(text: Column, n: int = 3) -> Column:
    """Array of space-joined word n-grams (empty when < n words)."""
    ws = tokens(text)
    # sequence(1, size-n+1) is empty when size < n  -> transform yields []
    return F.when(F.size(ws) < n, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(ws) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(ws, i, n)),
        )
    )


def repetition_stats(docs, text_col: str = "text", id_col: str = "doc_id",
                     n: int = 2):
    """Gopher-style repetition signal: per document, the total word
    n-gram count, the most frequent n-gram's count, and their ratio
    (``rep_frac`` — boilerplate/templated text scores high). Docs with
    fewer than ``n`` words are omitted (no n-grams to measure).

    Two hash aggregations with map-side partial combine — the
    (doc, gram) explode never leaves its input partition before the
    first combine, so at corpus scale the shuffle carries one row per
    DISTINCT (doc, gram), not one per token."""
    grams = docs.select(
        id_col, F.explode(word_ngrams(F.col(text_col), n)).alias("gram"))
    freq = grams.groupBy(id_col, "gram").agg(F.count(F.lit(1)).alias("c"))
    return freq.groupBy(id_col).agg(
        F.sum("c").alias("n_grams"),
        F.max("c").alias("max_freq"),
        F.round(F.max("c") / F.sum("c"), 6).alias("rep_frac"),
    )


def fingerprint(text: Column, n: int = 3) -> Column:
    """Document fingerprint: min(md5(word n-gram)) — a deterministic
    winnowing-style rolling fingerprint; md5 is identical across
    engines so the oracle can reproduce it bit-for-bit. Docs with < n
    words fall back to md5(full text)."""
    grams = word_ngrams(text, n)
    hashes = F.transform(grams, lambda g: F.md5(g))
    return F.when(F.size(hashes) == 0, F.md5(text)).otherwise(
        F.array_min(hashes)
    )
