"""PII redaction — curation-stage scrubbing of emails, IPs, SSNs and
phone numbers from document text.

No Jena analog (this is a training-data-pipeline operator, like the
dedup/quality family); the regex posture follows the text-quality
operators in :mod:`jena_spark.data.text`: every pattern is a single
JVM-side ``regexp_replace``/``regexp_count`` inside whole-stage
codegen — no Python on the data path, so the scrub runs at full scan
speed on 100 TB and composes with :func:`data.curate.curate_corpus`.

Patterns are deliberately RE2-compatible (no backreferences or
lookaround) so the DuckDB oracle evaluates the IDENTICAL expressions
— the driver-checked ``data_pii_redaction`` query hash-compares the
redacted text, which would catch any Java-vs-RE2 semantic drift.

Replacement order matters (a phone pattern could otherwise eat SSN or
IP digit runs): email -> IP -> SSN -> phone, fixed here and mirrored
in the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: (name, pattern, replacement) — applied in order.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ip", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "[IP]"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "[SSN]"),
    # international (+-prefixed), parenthesized-area-code domestic
    # ((415) 555-0134), and separator-joined domestic (415-555-0134 /
    # 415.555.0134). Space-only domestic runs ("415 555 0134") are
    # deliberately out of scope: three bare digit groups are too common
    # in prose to scrub safely. SSNs (3-2-4) and IPs are already
    # replaced by the time this pattern runs, so they can't be eaten.
    ("phone",
     r"(?:\+\d[\d -]{7,14}\d|\(\d{3}\) ?\d{3}[-. ]\d{4}\b|\b\d{3}[-.]\d{3}[-.]\d{4}\b)",
     "[PHONE]"),
]


def redact_text(col: Column) -> Column:
    """Scrubbed text: every PII pattern replaced by its tag, in the
    fixed order above."""
    out = col
    for _, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_counts(col: Column) -> list[tuple[str, Column]]:
    """(name, count) per category, counted in replacement order on the
    PROGRESSIVELY scrubbed text — the counts describe exactly what
    :func:`redact_text` replaced (an email's host never double-counts
    as an IP-ish digit run)."""
    out = []
    cur = col
    for name, pat, repl in PII_PATTERNS:
        out.append((name, F.regexp_count(cur, F.lit(pat))))
        cur = F.regexp_replace(cur, pat, repl)
    return out


def redact_docs(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Per-document scrub report: redacted text plus one count column
    per category (``n_email``/``n_ip``/``n_ssn``/``n_phone``). One
    narrow projection over the scan — no shuffle, no Python."""
    col = F.col(text_col)
    return docs.select(
        id_col,
        redact_text(col).alias("redacted"),
        *[c.alias(f"n_{name}") for name, c in pii_counts(col)],
    )


def pii_census_conversations(turns: DataFrame, conv_id: str = "conv_id",
                             text: str = "text") -> DataFrame:
    """Per-conversation PII census — the ship/scrub/drop verdict for a
    transcript corpus (chat logs carry PII in USER turns far more
    often than web documents do; the release decision is made per
    conversation, not per turn).

    Returns ``(conv_id, n_email, n_ip, n_ssn, n_phone, n_pii_turns,
    clean)``: per-category totals over all turns, the number of turns
    containing any PII, and ``clean = 1`` iff nothing matched.
    Category counts use the same progressive-scrub order as
    :func:`pii_counts` (an email's host never double-counts as an
    IP-ish digit run).

    Shape: the per-turn battery is the same map-only codegen
    projection as :func:`redact_docs`; the rollup is one partial-agg
    sum on the conv_id key the transcripts derivation already
    partitions by. To actually scrub, apply :func:`redact_text` to
    the turn text and keep conversations by this frame's verdict.
    """
    counts = pii_counts(F.col(text))
    per_turn = turns.select(
        F.col(conv_id).alias("conv_id"),
        *[c.cast("long").alias(f"_{name}") for name, c in counts])
    total = sum(F.col(f"_{name}") for name, _, _ in PII_PATTERNS)
    return (per_turn
            .withColumn("_hit", (total > 0).cast("long"))
            .groupBy("conv_id")
            .agg(*[F.sum(f"_{name}").alias(f"n_{name}")
                   for name, _, _ in PII_PATTERNS],
                 F.sum("_hit").alias("n_pii_turns"))
            .select("conv_id", "n_email", "n_ip", "n_ssn", "n_phone",
                    "n_pii_turns",
                    (F.col("n_pii_turns") == 0).cast("int").alias("clean")))
