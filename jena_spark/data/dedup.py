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


def exact_dedup_incremental(
    new_docs: DataFrame, prior: DataFrame | None,
    text_col: str = "text", id_col: str = "doc_id",
) -> tuple[DataFrame, DataFrame]:
    """Fold a NEW batch into an existing exact-dedup state — the
    data-side analog of ``canonicalize.construct_incremental``: at
    corpus scale dedup is maintained per arriving batch against a
    persistent hash store, never recomputed over the whole history.

    ``prior`` is the ``(text_hash, rep_id)`` store from earlier
    batches (``None`` for the first batch). Returns ``(verdicts,
    state)``:

    * ``verdicts`` — one row per NEW document: ``(doc_id, kept,
      rep_id)`` where ``kept`` is True iff this document is the first
      occurrence of its text EVER (prior batches win over this batch;
      within the batch the min id wins) and ``rep_id`` is the
      surviving witness of its text.
    * ``state`` — the updated ``(text_hash, rep_id)`` store to pass to
      the next fold.

    Invariant (pytest-pinned): folding batches in order is
    row-identical to one-shot ``exact_groups`` over the concatenation
    whenever ids are globally monotone across batches (the
    keep-first total order is (batch, id) either way).

    Scale shape: one hash aggregate over the NEW batch only, one
    left join against the store on 32-byte hash keys (AQE picks
    broadcast while the delta is small, shuffled-hash when it is
    not); the store is append-only — per-batch cost never grows with
    corpus history beyond the join's store side."""
    batch = exact_groups(new_docs, text_col, id_col) \
        .select("text_hash", F.col("rep_id").alias("_batch_rep"))
    if prior is None:
        winners = batch.select(
            "text_hash", F.col("_batch_rep").alias("rep_id"),
            F.lit(True).alias("_new"))
    else:
        winners = batch.join(
            prior.select("text_hash", F.col("rep_id").alias("_prior_rep")),
            "text_hash", "left",
        ).select(
            "text_hash",
            F.coalesce("_prior_rep", "_batch_rep").alias("rep_id"),
            F.col("_prior_rep").isNull().alias("_new"))
    verdicts = (new_docs.select(
                    F.col(id_col),
                    F.sha2(F.col(text_col), 256).alias("text_hash"))
                .join(winners, "text_hash")
                .select(id_col,
                        (F.col(id_col) == F.col("rep_id")).alias("kept"),
                        "rep_id"))
    new_state = winners.where("_new").select("text_hash", "rep_id")
    state = new_state if prior is None else \
        prior.select("text_hash", "rep_id").unionByName(new_state)
    return verdicts, state


# --- token-set Jaccard (inverted-index join) --------------------------------

def _token_sets(docs: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    grams = word_ngrams(F.col(text_col), n) if n > 1 else tokens(F.col(text_col))
    return (
        docs.select(F.col(id_col).alias("doc"), F.explode(grams).alias("tok"))
        # split("") yields [""] — an empty/whitespace doc must have an
        # EMPTY token set, not a phantom "" token (two empty docs are
        # not jaccard-1 duplicates)
        .where(F.col("tok") != "")
        .distinct()
    )


def hot_tokens(
    docs: DataFrame, max_df: int,
    text_col: str = "text", id_col: str = "doc_id", ngram: int = 1,
) -> DataFrame:
    """Tokens that a ``max_df`` cap would drop, with their document
    frequency. No silent caps: callers that cap should surface this
    (count it, log it, or write it next to the output) — at 10^9 docs a
    dropped ubiquitous shingle is a semantic decision, not a detail."""
    toks = _token_sets(docs, text_col, id_col, ngram)
    return (
        toks.groupBy("tok").agg(F.count("*").alias("df"))
        .where(F.col("df") > max_df)
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

_MERSENNE31 = (1 << 31) - 1  # prime modulus for the permutation family


def _perm_params(k: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for the universal-hash permutation
    family h_i(x) = (a_i*x + b_i) mod (2^31-1), a_i != 0. Derived from
    golden-ratio hashing of i — fixed across runs and engines."""
    params = []
    for i in range(k):
        a = (0x9E3779B9 * (2 * i + 1)) % _MERSENNE31 or 1
        b = (0x85EBCA6B * (i + 1)) % _MERSENNE31
        params.append((a, b))
    return params


def minhash_signatures(
    docs: DataFrame, k: int = 32, text_col: str = "text", id_col: str = "doc_id",
    ngram: int = 1, tokens: DataFrame | None = None,
) -> DataFrame:
    """k-permutation MinHash via universal hashing: ONE xxhash64 per
    token, then k affine permutations h_i(x) = (a_i*x + b_i) mod p —
    the standard trick that makes signature cost O(tokens + k) cheap
    arithmetic instead of O(k) full hash invocations per token (the
    previous form; measured ~30% of the whole MinHash wall). The base
    hash is folded to 31 bits so the multiply stays inside a 63-bit
    long — Spark 4 ANSI mode throws on long overflow, so wrapping
    arithmetic is not available.

    One explode + one groupBy; all JVM-side. ``tokens`` lets a caller
    share one materialized token frame across pipeline stages."""
    toks = tokens if tokens is not None else _token_sets(docs, text_col, id_col, ngram)
    h31 = F.pmod(F.xxhash64(F.col("tok")), F.lit(_MERSENNE31))
    hashes = F.array(*[
        F.pmod(h31 * F.lit(a) + F.lit(b), F.lit(_MERSENNE31))
        for a, b in _perm_params(k)
    ])
    return (
        toks.select("doc", hashes.alias("hs"))
        .groupBy("doc")
        .agg(
            F.array(*[F.min(F.element_at("hs", i + 1)) for i in range(k)]).alias("sig")
        )
    )


def _banded(signatures: DataFrame, bands: int) -> DataFrame:
    """(doc, band, bucket) — one bucket hash per signature band."""
    sig_len = F.size("sig")
    rows_per_band = (sig_len / bands).cast("int")
    return signatures.select(
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


def lsh_candidates(signatures: DataFrame, bands: int = 8) -> DataFrame:
    """Band the signature; docs sharing any band bucket are candidates."""
    banded = _banded(signatures, bands)
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


def jaccard_for_pairs(
    pairs: DataFrame, docs: DataFrame,
    text_col: str = "text", id_col: str = "doc_id", ngram: int = 1,
    tokens: DataFrame | None = None,
) -> DataFrame:
    """Exact token-set Jaccard for a GIVEN pair list only.

    This is the LSH verify step done right: the token table is
    semi-joined down to docs that appear in a candidate pair, then the
    intersection count is computed per candidate pair — cost scales
    with |pairs| x tokens/doc, NOT with the all-sharing-pairs space
    (which is what the full inverted-index self-join would touch and
    what LSH exists to avoid). Pairs with zero shared tokens get
    jaccard 0 — including pairs referencing a token-LESS doc
    (empty/whitespace text): sizes are left-joined and coalesced to 0,
    and the 0/0 case (both docs empty) scores 0, never a dropped row
    (r2 advice — unreachable via minhash_dedup_pairs, but this is a
    public API taking arbitrary pair lists).
    """
    toks = tokens if tokens is not None else _token_sets(docs, text_col, id_col, ngram)
    cand_docs = (
        pairs.select(F.col("doc_a").alias("doc"))
        .union(pairs.select(F.col("doc_b").alias("doc")))
        .distinct()
    )
    toks = toks.join(cand_docs, "doc", "left_semi")
    sizes = toks.groupBy("doc").agg(F.count("*").alias("sz"))
    ta, tb = toks.alias("ta"), toks.alias("tb")
    inter = (
        pairs.join(ta, F.col("doc_a") == F.col("ta.doc"))
        .join(tb, (F.col("doc_b") == F.col("tb.doc")) & (F.col("ta.tok") == F.col("tb.tok")))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    sz_a = sizes.select(F.col("doc").alias("doc_a"), F.col("sz").alias("sz_a"))
    sz_b = sizes.select(F.col("doc").alias("doc_b"), F.col("sz").alias("sz_b"))
    union_sz = (
        F.coalesce(F.col("sz_a"), F.lit(0)) + F.coalesce(F.col("sz_b"), F.lit(0))
        - F.coalesce(F.col("inter"), F.lit(0))
    )
    return (
        pairs.join(inter, ["doc_a", "doc_b"], "left")
        .join(sz_a, "doc_a", "left").join(sz_b, "doc_b", "left")
        .withColumn(
            "jaccard",
            F.when(union_sz == 0, F.lit(0.0)).otherwise(
                F.round(F.coalesce(F.col("inter"), F.lit(0)) / union_sz, 6)
            ),
        )
        .select("doc_a", "doc_b", "jaccard")
    )


def minhash_dedup_pairs(
    docs: DataFrame, threshold: float = 0.5, k: int = 32, bands: int = 8,
    text_col: str = "text", id_col: str = "doc_id", ngram: int = 1,
) -> DataFrame:
    """LSH candidates verified with exact Jaccard over the candidate
    pairs ONLY (:func:`jaccard_for_pairs`) — the verify step never
    touches the all-token-sharing-pairs space, so the LSH pruning
    actually pays at scale. (Hot tokens are harmless here: per-pair
    intersection cost is bounded by tokens/doc, so no ``max_df`` cap is
    needed in the verify — unlike the exhaustive ``jaccard_pairs``.)"""
    # Each stage tokenizes independently ON PURPOSE: persisting one
    # shared token frame was measured SLOWER (it materializes the
    # exploded token rows and breaks the explode->hash->groupBy
    # whole-stage-codegen fusion; and at 10^9-doc scale an exploded
    # token table cannot be cached anyway). Re-tokenizing keeps both
    # stages single-pass streaming over the (column-pruned) corpus.
    # Callers that already HAVE a materialized token table pass it via
    # ``tokens=`` on the stage functions.
    sigs = minhash_signatures(docs, k, text_col, id_col, ngram)
    cands = lsh_candidates(sigs, bands)
    scored = jaccard_for_pairs(cands, docs, text_col, id_col, ngram)
    return scored.where(F.col("jaccard") >= threshold)


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
    the 64-bit fingerprint into ``max_hamming + 1`` bit-blocks — by
    pigeonhole, a pair with at most ``max_hamming`` differing bits has
    at least one block with ZERO differing bits, i.e. shares that block
    exactly, so the join is block-equality, never a cross join. (With
    fewer blocks the guarantee is false: k blocks only cover distance
    k-1; ``tests/test_dedup.py`` property-checks recall against the
    brute-force pair set.) More blocks = narrower blocks = more
    candidate collisions — the standard recall/cost dial of
    multi-index Hamming search."""
    n_blocks = max_hamming + 1
    base, extra = divmod(64, n_blocks)
    widths = [base + (1 if i < extra else 0) for i in range(n_blocks)]
    offsets = [sum(widths[:i]) for i in range(n_blocks)]
    sh = simhash(docs, text_col, id_col)
    blocks = sh.select(
        "doc", "simhash",
        F.posexplode(
            F.array(*[
                F.shiftright(F.col("simhash"), offsets[i]).bitwiseAND(
                    F.lit((1 << widths[i]) - 1)
                )
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


def dedup_clusters(
    pairs: DataFrame, docs: DataFrame | None = None, id_col: str = "doc_id",
) -> DataFrame:
    """Near-dup PAIRS -> duplicate CLUSTERS -> survivors: the final
    step of every dedup pipeline (keep ONE document per connected
    component of the similarity graph). Reuses the sameAs closure's
    hybrid connected-components machinery
    (:func:`jena_spark.pipeline.canonicalize.connected_components` —
    driver union-find for small edge sets, distributed
    large-star/small-star above the threshold), so the scale path is
    the one already proven on the entity graph.

    Returns ``(id_col, cluster, keep)``: ``cluster`` is the MINIMUM
    doc id of the component (deterministic survivor election, the same
    min-member rule as the sameAs representative), ``keep`` is true
    exactly for the survivor. Pass ``docs`` to also emit singleton
    rows (docs in no pair are their own cluster, keep=true) — the
    frame a filter-and-write dedup job consumes directly.

    Ids travel through CC as zero-padded decimal strings so the
    lexicographic min the CC elects IS the numeric min — which requires
    NON-NEGATIVE ids (a negative id zero-pads to a lexicographically
    wrong position), so negatives are rejected loudly up front; ANSI
    cast already rejects non-numeric ids.
    """
    from jena_spark.pipeline.canonicalize import connected_components

    bad = pairs.where(
        (F.col("doc_a").cast("long") < 0) | (F.col("doc_b").cast("long") < 0)
    ).limit(1)
    if not bad.isEmpty():
        raise ValueError(
            "dedup_clusters: negative doc ids break the padded-string "
            "min election; remap ids to a non-negative domain first")
    pad = lambda c: F.format_string("%020d", F.col(c).cast("long"))  # noqa: E731
    edges = pairs.select(pad("doc_a").alias("src"), pad("doc_b").alias("dst"))
    mapping = connected_components(edges)
    clusters = mapping.select(
        F.col("node").cast("long").alias(id_col),
        F.col("component").cast("long").alias("cluster"),
    )
    if docs is not None:
        all_ids = docs.select(id_col).distinct()
        clusters = all_ids.join(clusters, id_col, "left").select(
            id_col, F.coalesce("cluster", F.col(id_col)).alias("cluster"))
    return clusters.select(
        id_col, "cluster", (F.col(id_col) == F.col("cluster")).alias("keep"))


def minhash_dedup_incremental(
    new_docs: DataFrame, prior: DataFrame | None = None, *,
    k: int = 32, bands: int = 8, threshold: float = 0.7,
    text_col: str = "text", id_col: str = "doc_id", ngram: int = 1,
) -> tuple[DataFrame, DataFrame]:
    """Fold a NEW batch into a persistent MinHash-LSH store — the
    fuzzy counterpart of :func:`exact_dedup_incremental`: at corpus
    scale near-dedup is maintained per arriving batch against a
    signature store, never recomputed over the whole history.

    ``prior`` is the ``(doc, batch, sig)`` store from earlier batches
    (``None`` first batch) — it holds ALL earlier docs, not survivors
    only: under chained near-dups (C≈B≈A but C≉A) a survivor-only
    store would silently change semantics between fold orders. Returns
    ``(verdicts, state)``:

    * ``verdicts`` — one row per NEW document: ``(doc_id, kept,
      rep_id)``. ``kept`` is True iff NO earlier document (prior
      batches win over this batch; within the batch the smaller id
      wins) shares an LSH band bucket AND matches on the signature
      estimate; ``rep_id`` is the earliest such match (self when
      kept). Verification is the signature ESTIMATE — the integer
      count of equal MinHash components ``>= ceil(threshold*k)`` — 
      because the store holds signatures only, never text (the honest
      scale design: k longs per historical doc). The one-shot path
      with exact-Jaccard verification remains ``lsh_candidates`` +
      ``jaccard_for_pairs``.
    * ``state`` — ``prior`` plus this batch's ``(doc, batch, sig)``.

    Invariant (pytest-pinned): folding batches in order is
    row-identical to one fold of the concatenation whenever ids are
    globally monotone across batches — the match total order is
    (batch, id) either way.

    Scale shape: signatures are computed for the NEW batch only; the
    store side contributes arithmetic-only banding (no text, no
    explode of history tokens); the candidate join keys on (band,
    bucket) — the same equi-shuffle LSH always pays — and the verify
    is a size-k integer comparison per candidate pair.
    """
    import math

    sig_new = minhash_signatures(new_docs, k, text_col, id_col, ngram)
    if prior is None:
        batch_no, store = 0, None
    else:
        batch_no = prior.agg(F.max("batch")).first()[0] + 1
        store = prior
    mine = sig_new.select("doc", F.lit(batch_no).alias("batch"), "sig") \
        .localCheckpoint(eager=False)  # banding + verify + state reuse
    earlier = mine if store is None else store.unionByName(mine)
    bn = _banded(mine.select("doc", "sig"), bands) \
        .withColumnRenamed("doc", "doc_b")
    be = _banded(earlier.select("doc", "sig"), bands) \
        .withColumnRenamed("doc", "doc_a")
    ea = earlier.select(F.col("doc").alias("doc_a"),
                        F.col("batch").alias("batch_a"),
                        F.col("sig").alias("sig_a"))
    nb = mine.select(F.col("doc").alias("doc_b"),
                     F.col("batch").alias("batch_b"),
                     F.col("sig").alias("sig_b"))
    cand = (be.join(bn, ["band", "bucket"])
            .select("doc_a", "doc_b").distinct()
            .join(ea, "doc_a").join(nb, "doc_b")
            # "earlier" = strictly smaller (batch, id)
            .where((F.col("batch_a") < F.col("batch_b"))
                   | ((F.col("batch_a") == F.col("batch_b"))
                      & (F.col("doc_a") < F.col("doc_b")))))
    need = int(math.ceil(threshold * k))
    est = F.size(F.filter(F.zip_with("sig_a", "sig_b",
                                     lambda x, y: x == y),
                          lambda v: v))
    matches = cand.where(est >= need)
    best = matches.groupBy("doc_b").agg(
        F.min(F.struct("batch_a", "doc_a")).alias("_m"))
    # verdict for EVERY input doc: a token-less document has no
    # signature (no row in `mine`), can collide with nothing, and is
    # kept as its own representative — it is also excluded from the
    # store (nothing to match against later)
    verdicts = (new_docs.select(F.col(id_col))
                .join(best.withColumnRenamed("doc_b", id_col),
                      id_col, "left")
                .select(id_col,
                        F.col("_m").isNull().alias("kept"),
                        F.coalesce(F.col("_m")["doc_a"],
                                   F.col(id_col)).alias("rep_id")))
    state = mine if store is None else store.unionByName(mine)
    return verdicts, state
