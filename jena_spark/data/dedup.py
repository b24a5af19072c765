"""Deduplication operators: exact, token-Jaccard, MinHash+LSH, SimHash,
embedding-cosine near-dup.

Scale design notes (the part that matters at 100 TB):

* Exact dedup is a single hash aggregation on sha256(text) — map-side
  partial agg absorbs duplicates before shuffle.
* Pairwise similarity NEVER does an O(n²) cross join. The Jaccard path
  builds an inverted index (token -> doc) and self-joins it, so only
  pairs sharing at least one token meet; MinHash-LSH reduces that
  further to pairs sharing a band bucket (tunable collision
  probability), then verifies candidates exactly. This is the standard
  shuffle-bounded near-dup topology.
* Hot tokens (stopwords) explode the inverted index — ``df`` filtering
  (drop tokens appearing in > max_df docs) caps the blow-up, the same
  trick as skew salting but semantically principled for similarity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jena_spark.data.text import tokens, word_ngrams


# --- exact ------------------------------------------------------------------

def exact_groups(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """sha256(text) groups: representative (min id) + member count."""
    return (
        docs.select(F.col(id_col), F.sha2(F.col(text_col), 256).alias("text_hash"))
        .groupBy("text_hash")
        .agg(F.min(id_col).alias("rep_id"), F.count("*").alias("n_docs"))
    )


def drop_exact_dups(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one witness per distinct text (min id wins — deterministic)."""
    w = exact_groups(docs, text_col, id_col).select(F.col("rep_id").alias(id_col))
    return docs.join(F.broadcast(w), id_col, "left_semi")


# --- token-set Jaccard (inverted-index join) --------------------------------

def _token_sets(docs: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    grams = word_ngrams(F.col(text_col), n) if n > 1 else tokens(F.col(text_col))
    return (
        docs.select(F.col(id_col).alias("doc"), F.explode(grams).alias("tok"))
        .distinct()
    )


def jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 1,
    max_df: int | None = None,
) -> DataFrame:
    """All (a < b) pairs with token-set Jaccard >= threshold.

    inverted index self-join -> co-occurrence counts -> |A∪B| via
    per-doc set sizes. ``max_df`` drops ubiquitous tokens before the
    join (index blow-up control at scale).
    """
    toks = _token_sets(docs, text_col, id_col, ngram)
    if max_df is not None:
        rare = toks.groupBy("tok").agg(F.count("*").alias("df")).where(F.col("df") <= max_df)
        toks = toks.join(rare.select("tok"), "tok")
    sizes = toks.groupBy("doc").agg(F.count("*").alias("sz"))
    a, b = toks.alias("a"), toks.alias("b")
    inter = (
        a.join(b, (F.col("a.tok") == F.col("b.tok")) & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .agg(F.count("*").alias("inter"))
    )
    sz_a = sizes.select(F.col("doc").alias("doc_a"), F.col("sz").alias("sz_a"))
    sz_b = sizes.select(F.col("doc").alias("doc_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sz_a, "doc_a").join(sz_b, "doc_b")
        .withColumn(
            "jaccard",
            F.round(F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 6),
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


# --- MinHash + LSH -----------------------------------------------------------

def minhash_signatures(
    docs: DataFrame, k: int = 32, text_col: str = "text", id_col: str = "doc_id",
    ngram: int = 1,
) -> DataFrame:
    """k-permutation MinHash: h_i(tok) = xxhash64(tok, seed=i); the
    signature is array_min per seed. One explode + one groupBy — the
    k hashes are computed inside a single projected array (JVM-side),
    not k passes."""
    toks = _token_sets(docs, text_col, id_col, ngram)
    hashes = F.array(*[F.xxhash64(F.col("tok"), F.lit(i)) for i in range(k)])
    return (
        toks.select("doc", hashes.alias("hs"))
        .groupBy("doc")
        .agg(
            F.array(*[F.min(F.element_at("hs", i + 1)) for i in range(k)]).alias("sig")
        )
    )


def lsh_candidates(signatures: DataFrame, bands: int = 8) -> DataFrame:
    """Band the signature; docs sharing any band bucket are candidates."""
    sig_len = F.size("sig")
    rows_per_band = (sig_len / bands).cast("int")
    banded = signatures.select(
        "doc",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(
                    F.concat_ws(
                        ",",
                        F.transform(
                            F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band),
                            lambda x: x.cast("string"),
                        ),
                    ),
                    # band index in the hash so buckets don't collide across bands
                    F.lit(1),
                ) + b,
            )
        ).alias("band", "bucket"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .distinct()
    )


def minhash_dedup_pairs(
    docs: DataFrame, threshold: float = 0.5, k: int = 32, bands: int = 8,
    text_col: str = "text", id_col: str = "doc_id", ngram: int = 1,
) -> DataFrame:
    """LSH candidates verified with exact Jaccard (candidates only —
    the verify join touches a tiny fraction of the pair space)."""
    sigs = minhash_signatures(docs, k, text_col, id_col, ngram)
    cands = lsh_candidates(sigs, bands)
    exact = jaccard_pairs(docs, threshold=0.0, text_col=text_col, id_col=id_col, ngram=ngram)
    return (
        cands.join(exact, ["doc_a", "doc_b"])
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


# --- SimHash -----------------------------------------------------------------

def simhash(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
            bits: int = 64) -> DataFrame:
    """64-bit SimHash: per token hash, ±1 vote per bit position, sign
    -> fingerprint bit. Implemented as posexplode over bit positions +
    one aggregation (all JVM-side)."""
    toks = _token_sets(docs, text_col, id_col, 1)
    h = F.xxhash64("tok")
    votes = F.transform(
        F.sequence(F.lit(0), F.lit(bits - 1)),
        lambda i: F.when(F.bit_get(h, i) == 1, 1).otherwise(-1),
    )
    per_bit = (
        toks.select("doc", F.posexplode(votes).alias("bit", "vote"))
        .groupBy("doc", "bit")
        .agg(F.sum("vote").alias("v"))
    )
    return per_bit.groupBy("doc").agg(
        F.sum(
            F.expr("IF(v > 0, shiftleft(CAST(1 AS BIGINT), CAST(bit AS INT)), 0L)")
        ).alias("simhash")
    )


def simhash_near_pairs(docs: DataFrame, max_hamming: int = 8,
                       text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Near-dup pairs by Hamming distance on SimHash. Blocking: split
    the 64-bit fingerprint into (max_hamming+1)-ish bands — any pair
    within distance d shares at least one exact band (pigeonhole), so
    the join is band-equality, never a cross join."""
    n_blocks = 4
    sh = simhash(docs, text_col, id_col)
    blocks = sh.select(
        "doc", "simhash",
        F.posexplode(
            F.array(*[
                F.shiftright(F.col("simhash"), i * 16).bitwiseAND(F.lit(0xFFFF))
                for i in range(n_blocks)
            ])
        ).alias("block", "block_val"),
    )
    a, b = blocks.alias("a"), blocks.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.block_val") == F.col("b.block_val"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(
            F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"),
        )
        .distinct()
    )
    return pairs.where(F.col("hamming") <= max_hamming)


# --- embedding cosine near-dup ------------------------------------------------

def cosine(a, b):
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)
    na = F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda s, x: s + x))
    nb = F.sqrt(F.aggregate(F.transform(b, lambda x: x * x), F.lit(0.0), lambda s, x: s + x))
    return dot / (na * nb)


def embedding_near_dups(
    embeddings: DataFrame, threshold: float = 0.95,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Cosine near-dup pairs. Brute-force O(n²) — correct baseline for
    verification; production path is :mod:`jena_spark.data.similarity`
    LSH bucketing which replaces the cross join with bucket-equality."""
    e = embeddings.select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )
    a, b = e.alias("a"), e.alias("b")
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
            F.round(cosine(F.col("a.v"), F.col("b.v")), 6).alias("cos"),
        )
        .where(F.col("cos") >= threshold)
    )
