"""Unicode text normalization + encoding-damage census for corpora.

A web-scale corpus arrives with mixed Unicode normal forms (decomposed
accents out of OCR/mac filesystems), stray control characters, tab/
space runs, and **mojibake** (UTF-8 bytes decoded as Latin-1 — the
``Ã©`` / ``â€™`` artifacts). Training-data pipelines canonicalize the
first three and *census* the fourth (repair needs byte-level
heuristics; flagging is the honest, deterministic subset — the ftfy
posture without guessing).

Pipeline (fixed order, mirrored exactly in the DuckDB twin):

1. strip C0/C1-ish control characters (keeping ``\\t``/``\\n``/``\\r``),
2. collapse space/tab runs to one space,
3. Unicode NFC (Arrow-batched ``unicodedata.normalize`` on the Spark
   side — the one step Catalyst has no builtin for; ``nfc_normalize``
   in DuckDB — both implement UAX#15 NFC, so they agree by spec).

Census columns count what each step touched on the PROGRESSIVELY
cleaned text (the ``data/redact.py`` discipline: counts describe
exactly what the cleaner replaced).

Distributed shape: map-only — two JVM regexp passes inside whole-stage
codegen plus one Arrow-batched vectorized UDF; no shuffle, no
``collect``. At 100 TB this runs at scan speed and the UDF cost is
amortized per Arrow batch.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

#: control characters stripped (C0 minus \t\n\r, plus DEL) — RE2- and
#: Java-regex-compatible spelling, mirrored in the SQL twin.
CTL_PATTERN = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]"

#: space/tab runs collapsed to a single space.
WS_PATTERN = "[ \\t]{2,}"

#: common UTF-8-decoded-as-Latin-1 artifacts — literal alternation
#: (no metacharacters), identical bytes in both engines.
MOJIBAKE_PATTERN = "(Ã©|Ã¨|Ã¼|Ã±|Ã¶|â€™|â€œ|â€|â€“|Â )"


def _nfc(col: Column) -> Column:
    # the UDF is built per call: decorating at import time would need an
    # active SparkSession (DDL return-type parsing), which breaks bare
    # imports of this module
    @pandas_udf("string")
    def nfc(s: pd.Series) -> pd.Series:
        return s.map(lambda v: None if v is None
                     else unicodedata.normalize("NFC", v))
    return nfc(col)


def clean_text(col: Column) -> Column:
    """Steps 1–3 applied in order (control strip, whitespace collapse,
    NFC)."""
    out = F.regexp_replace(col, CTL_PATTERN, "")
    out = F.regexp_replace(out, WS_PATTERN, " ")
    return _nfc(out)


def normalize_corpus(docs: DataFrame, id_col: str = "doc_id",
                     text: str = "text") -> DataFrame:
    """``(doc_id, n_ctl, n_ws_runs, n_mojibake, n_before, n_after,
    changed, norm_text)`` — one row per document.

    ``n_ctl`` / ``n_ws_runs`` count on the raw / control-stripped text
    respectively (what each step actually touched); ``n_mojibake``
    counts artifacts on the fully cleaned text (they survive cleaning
    — that's the point of the census). ``changed`` is the end-to-end
    fixpoint test ``norm_text != text``.
    """
    raw = F.col(text)
    step1 = F.regexp_replace(raw, CTL_PATTERN, "")
    cleaned = clean_text(raw)
    return docs.select(
        id_col,
        F.regexp_count(raw, F.lit(CTL_PATTERN)).cast("bigint")
         .alias("n_ctl"),
        F.regexp_count(step1, F.lit(WS_PATTERN)).cast("bigint")
         .alias("n_ws_runs"),
        F.regexp_count(cleaned, F.lit(MOJIBAKE_PATTERN)).cast("bigint")
         .alias("n_mojibake"),
        F.length(raw).cast("bigint").alias("n_before"),
        F.length(cleaned).cast("bigint").alias("n_after"),
        (cleaned != raw).alias("changed"),
        cleaned.alias("norm_text"),
    )


def normalize_corpus_sql(docs_cte: str, id_col: str = "doc_id",
                         text: str = "text") -> str:
    """DuckDB twin of :func:`normalize_corpus` over a CTE body with
    ``(id_col, text)`` columns — identical patterns, identical step
    order, ``nfc_normalize`` for step 3."""
    ctl = CTL_PATTERN.replace("'", "''")
    ws = WS_PATTERN
    moj = MOJIBAKE_PATTERN
    return f"""WITH docs AS ({docs_cte}),
s AS (
  SELECT {id_col}, {text} AS raw,
         regexp_replace({text}, '{ctl}', '', 'g') AS step1
  FROM docs),
c AS (
  SELECT *, nfc_normalize(regexp_replace(step1, '{ws}', ' ', 'g'))
           AS cleaned
  FROM s)
SELECT {id_col},
       CAST(len(regexp_extract_all(raw, '{ctl}')) AS BIGINT) AS n_ctl,
       CAST(len(regexp_extract_all(step1, '{ws}')) AS BIGINT)
         AS n_ws_runs,
       CAST(len(regexp_extract_all(cleaned, '{moj}')) AS BIGINT)
         AS n_mojibake,
       CAST(len(raw) AS BIGINT) AS n_before,
       CAST(len(cleaned) AS BIGINT) AS n_after,
       cleaned != raw AS changed,
       cleaned AS norm_text
FROM c"""


# self-check: normalization must be idempotent on its own output for
# the planted fixtures (NFC is idempotent by spec; the regexp steps
# are because their replacements never match their patterns).
assert unicodedata.normalize("NFC", "é") == "é"
