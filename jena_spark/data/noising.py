"""Objective-construction noising — deterministic span corruption and
fill-in-the-middle transforms that turn a clean corpus into
denoising / infilling training examples.

Two public recipes, both published methods:

* :func:`span_corruption` — the T5/UL2 denoising objective (Raffel et
  al. 2020, "Exploring the Limits of Transfer Learning with a Unified
  Text-to-Text Transformer"): mask token spans with sentinel tokens
  ``<extra_id_k>``; the model learns to emit the sentinels followed by
  the masked content.
* :func:`fim_transform` — fill-in-the-middle (Bavarian et al. 2022,
  "Efficient Training of Language Models to Fill in the Middle"):
  split a document into (prefix, middle, suffix) at two random
  character offsets and reorder so the middle comes last, teaching a
  causal model to infill.

Determinism (the repo-wide invariant): both transforms derive every
"random" choice from md5 uniforms of ``(salt, id, tag)`` — the same
``_hash32`` prefix idiom as :mod:`jena_spark.data.selection` — so
re-running a job regenerates byte-identical examples and the DuckDB
oracle evaluates the IDENTICAL offsets. T5's sequential span sampler
can't be parallelized exactly, so :func:`span_corruption` uses a
block-local variant: the token stream is cut into fixed ``block_size``
windows and each complete window masks one ``span_len`` span at an
md5-derived offset — the same noise density (``span_len /
block_size``), mean span length, and sentinel discipline, but every
(document, block) is independent, which is what lets the transform
run as a map-only projection at 100 TB.

Scale: both operators are one narrow projection over the scan — no
shuffle, no Python, no UDFs; the HOF lambdas (transform/flatten/
slice) stay JVM-side. Output cardinality equals input cardinality.

No Jena analog — LLM-data-pipeline surface (SURVEY.md "beyond the
reference" mandate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jena_spark.data.selection import _HASH_SPAN, _hash32


def span_corruption(docs: DataFrame, block_size: int = 20,
                    span_len: int = 3, id_col: str = "doc_id",
                    text_col: str = "text", salt: str = "") -> DataFrame:
    """T5-style span corruption, block-local and fully deterministic.

    Tokens (whitespace contract) are grouped into complete
    ``block_size``-token blocks; block *k* masks the ``span_len``
    tokens starting at offset ``md5(salt‖id‖':'‖k) %
    (block_size - span_len + 1)`` within the block, replaced by the
    sentinel ``<extra_id_k>``. The trailing partial block is never
    masked (T5 drops ragged tails the same way). Returns one row per
    document: ``(id, corrupted, targets, n_spans)`` where ``targets``
    is the concatenation ``<extra_id_0> masked… <extra_id_1> masked…``
    — exactly the seq2seq pair the objective trains on.
    """
    if span_len <= 0:
        raise ValueError(f"span_len must be positive, got {span_len}")
    if block_size <= span_len:
        raise ValueError(
            f"block_size ({block_size}) must exceed span_len "
            f"({span_len}) — a fully-masked block has no context")
    width = block_size - span_len + 1
    idc = F.col(id_col).cast("string")

    def _off(k):
        return _hash32(F.concat(F.lit(salt), idc, F.lit(":"),
                                k.cast("string"))) % width

    def _sentinel(k):
        return F.concat(F.lit("<extra_id_"), k.cast("string"), F.lit(">"))

    def _corrupt_block(k):
        o = _off(k)
        return F.concat(
            F.slice(F.col("_toks"), k * block_size + 1, o),
            F.array(_sentinel(k)),
            F.slice(F.col("_toks"), k * block_size + o + span_len + 1,
                    F.lit(block_size) - o - span_len))

    def _target_block(k):
        o = _off(k)
        return F.concat(
            F.array(_sentinel(k)),
            F.slice(F.col("_toks"), k * block_size + o + 1,
                    F.lit(span_len)))

    base = (docs.select(
        F.col(id_col),
        F.split(F.trim(F.col(text_col)), r"\s+").alias("_toks"))
        .withColumn("_n", F.size("_toks").cast("bigint"))
        .withColumn("_nb", F.expr(f"_n DIV {block_size}"))
        # Spark sequence(0, -1) DESCENDS — guard the no-block case
        .withColumn("_blocks", F.when(
            F.col("_nb") > 0,
            F.sequence(F.lit(0).cast("bigint"), F.col("_nb") - 1))
            .otherwise(F.array().cast("array<bigint>"))))
    tail = F.slice(F.col("_toks"),
                   F.col("_nb") * block_size + 1,
                   F.col("_n") - F.col("_nb") * block_size)
    return base.select(
        id_col,
        F.array_join(
            F.concat(F.flatten(F.transform("_blocks", _corrupt_block)),
                     tail), " ").alias("corrupted"),
        F.array_join(
            F.flatten(F.transform("_blocks", _target_block)),
            " ").alias("targets"),
        F.col("_nb").alias("n_spans"))


def fim_transform(docs: DataFrame, rate: float = 1.0,
                  mode: str = "psm", id_col: str = "doc_id",
                  text_col: str = "text", salt: str = "") -> DataFrame:
    """Fill-in-the-middle reordering at the character level.

    For a deterministic ``rate`` fraction of documents (md5 threshold,
    the :func:`jena_spark.data.selection.stratified_sample` idiom),
    two split points ``a, b = md5(salt‖id‖':a'|':b') % (len+1)`` cut
    the text into prefix/middle/suffix, emitted as

    * ``psm``: ``<PRE> prefix <SUF> suffix <MID> middle``
    * ``spm``: ``<SUF> suffix <PRE> prefix <MID> middle``

    (tag tokens adjacent, no inserted whitespace — the trained
    tokenizer owns spacing, per the paper). Unselected documents pass
    through untouched with ``applied = 0`` so the output is a full
    training corpus, not a filtered slice. Returns ``(id, fim_text,
    applied, n_prefix, n_middle, n_suffix)``.
    """
    if mode not in ("psm", "spm"):
        raise ValueError(f"mode must be 'psm' or 'spm', got {mode!r}")
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    thr = min(_HASH_SPAN, int(rate * _HASH_SPAN))
    idc = F.col(id_col).cast("string")
    n = F.length(F.col(text_col))
    a = _hash32(F.concat(F.lit(salt), idc, F.lit(":a"))) % (n + 1)
    b = _hash32(F.concat(F.lit(salt), idc, F.lit(":b"))) % (n + 1)
    lo, hi = F.least(a, b), F.greatest(a, b)
    applied = _hash32(F.concat(F.lit(salt), idc, F.lit(":r"))) < thr
    prefix = F.substring(F.col(text_col), F.lit(1), lo)
    middle = F.substring(F.col(text_col), lo + 1, hi - lo)
    suffix = F.substring(F.col(text_col), hi + 1, n - hi)
    if mode == "psm":
        fim = F.concat(F.lit("<PRE>"), prefix, F.lit("<SUF>"), suffix,
                       F.lit("<MID>"), middle)
    else:
        fim = F.concat(F.lit("<SUF>"), suffix, F.lit("<PRE>"), prefix,
                       F.lit("<MID>"), middle)
    return docs.select(
        id_col,
        F.when(applied, fim).otherwise(F.col(text_col)).alias("fim_text"),
        applied.cast("int").alias("applied"),
        F.when(applied, lo).otherwise(n).cast("bigint").alias("n_prefix"),
        F.when(applied, hi - lo).otherwise(F.lit(0))
        .cast("bigint").alias("n_middle"),
        F.when(applied, n - hi).otherwise(F.lit(0))
        .cast("bigint").alias("n_suffix"))


def _off_sql(id_sql: str, salt: str, width: int) -> str:
    return (f"(('0x' || substr(md5('{salt}' || {id_sql} || ':' || "
            f"CAST(k AS VARCHAR)), 1, 8))::BIGINT % {width})")


def span_corruption_sql(docs_cte: str, block_size: int = 20,
                        span_len: int = 3, id_col: str = "doc_id",
                        salt: str = "") -> str:
    """DuckDB twin of :func:`span_corruption` — identical md5 offsets,
    slicing, sentinels, and join spacing, so the result hash-matches.
    ``docs_cte`` must yield ``(id_col, text)``."""
    bs, sl = int(block_size), int(span_len)
    off = _off_sql(f"CAST({id_col} AS VARCHAR)", salt, bs - sl + 1)
    return f"""WITH src AS ({docs_cte}),
t AS (
  SELECT {id_col}, regexp_split_to_array(trim(text), '\\s+') AS toks,
         CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)
           AS n
  FROM src),
b AS (SELECT {id_col}, toks, n, n // {bs} AS nb FROM t)
SELECT {id_col},
  coalesce(array_to_string(
    flatten(list_transform(generate_series(0, nb - 1), k ->
      list_slice(toks, k*{bs} + 1, k*{bs} + {off}) ||
      ['<extra_id_' || CAST(k AS VARCHAR) || '>'] ||
      list_slice(toks, k*{bs} + {off} + {sl} + 1, (k+1)*{bs})))
    || list_slice(toks, nb*{bs} + 1, n), ' '), '') AS corrupted,
  coalesce(array_to_string(
    flatten(list_transform(generate_series(0, nb - 1), k ->
      ['<extra_id_' || CAST(k AS VARCHAR) || '>'] ||
      list_slice(toks, k*{bs} + {off} + 1, k*{bs} + {off} + {sl}))),
    ' '), '') AS targets,
  nb AS n_spans
FROM b"""


def fim_transform_sql(docs_cte: str, rate: float = 1.0,
                      mode: str = "psm", id_col: str = "doc_id",
                      salt: str = "") -> str:
    """DuckDB twin of :func:`fim_transform` (identical split points,
    tags, threshold). ``docs_cte`` must yield ``(id_col, text)``."""
    if mode not in ("psm", "spm"):
        raise ValueError(f"mode must be 'psm' or 'spm', got {mode!r}")
    thr = min(_HASH_SPAN, int(rate * _HASH_SPAN))
    idc = f"CAST({id_col} AS VARCHAR)"

    def h(tag: str) -> str:
        return (f"('0x' || substr(md5('{salt}' || {idc} || '{tag}'), "
                f"1, 8))::BIGINT")

    pre = "'<PRE>' || substr(text, 1, lo)"
    suf = "'<SUF>' || substr(text, hi + 1, n - hi)"
    mid = "'<MID>' || substr(text, lo + 1, hi - lo)"
    order = (f"{pre} || {suf} || {mid}" if mode == "psm"
             else f"{suf} || {pre} || {mid}")
    return f"""WITH src AS ({docs_cte}),
t AS (SELECT {id_col}, text, CAST(len(text) AS BIGINT) AS n FROM src),
h AS (SELECT {id_col}, text, n,
        {h(':a')} % (n + 1) AS a,
        {h(':b')} % (n + 1) AS b,
        CASE WHEN {h(':r')} < {thr} THEN 1 ELSE 0 END AS applied
      FROM t),
s AS (SELECT {id_col}, text, n, least(a, b) AS lo, greatest(a, b) AS hi,
             applied
      FROM h)
SELECT {id_col},
  CASE WHEN applied = 1 THEN {order} ELSE text END AS fim_text,
  CAST(applied AS INT) AS applied,
  CAST(CASE WHEN applied = 1 THEN lo ELSE n END AS BIGINT) AS n_prefix,
  CAST(CASE WHEN applied = 1 THEN hi - lo ELSE 0 END AS BIGINT)
    AS n_middle,
  CAST(CASE WHEN applied = 1 THEN n - hi ELSE 0 END AS BIGINT)
    AS n_suffix
FROM s"""
