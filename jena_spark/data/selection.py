"""Data selection — deterministic sampling and DSIR-style importance
scoring for training-corpus assembly.

Two public operators a 100 TB pipeline runs between curation and
packing:

* :func:`stratified_sample` — per-source deterministic sampling (the
  "mixture weights" step of every published pretraining recipe): keep
  a row iff an md5-derived uniform of its id falls under the source's
  rate. Pure map-side filter — no shuffle, no rand() (re-running the
  job reselects the identical subset, the repo-wide determinism
  invariant), exact-integer threshold comparison.
* :func:`importance_weights` — hashed n-gram importance scoring in
  the DSIR posture (Xie et al. 2023, "Data Selection for Language
  Models via Importance Resampling" — public method): estimate
  bag-of-hashed-ngram distributions for a small TARGET corpus and the
  RAW corpus, then score every raw document by its log-likelihood
  ratio Σ_b count_b·(ln p_target(b) − ln q_raw(b)). High scores =
  "looks like the target domain"; downstream selection takes the
  top-k or samples ∝ exp(score).

Scale design: gram→bucket hashing is md5-prefix modulo (engine-
portable, so the DuckDB oracle evaluates the IDENTICAL buckets); the
bucket distributions are B-row aggregates (B ≤ 64k) joined back
BROADCAST, so the corpus side of the scorer is map-only explode →
broadcast join → per-doc sum, exactly the decontaminate shuffle
shape. The per-bucket log-ratio is quantized to integer 1e-4 nats
BEFORE the per-doc sum, making the final aggregation exact integer
arithmetic — float summation order (which differs between engines and
between partitionings) can never perturb the result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jena_spark.data.decontaminate import _raw_ngrams

#: md5-prefix uniform: first 8 hex chars -> [0, 2^32)
_HASH_SPAN = 1 << 32


def _hash32(col) -> F.Column:
    """Deterministic 32-bit uniform of a string column (md5 prefix —
    identical in Spark and DuckDB, unlike xxhash64)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint")


def stratified_sample(df: DataFrame, rates: dict[str, float],
                      source_col: str = "source",
                      id_col: str = "doc_id",
                      salt: str = "") -> DataFrame:
    """Keep each row with its source's probability, deterministically:
    row kept iff ``hash32(salt || id) < rate * 2^32`` (exact integer
    threshold, computed driver-side — no float comparison drifts).
    Sources absent from ``rates`` are dropped (rate 0)."""
    thresholds = {s: min(_HASH_SPAN, int(r * _HASH_SPAN))
                  for s, r in rates.items()}
    thr = F.lit(0)
    for s, t in sorted(thresholds.items()):
        thr = F.when(F.col(source_col) == s, F.lit(t)).otherwise(thr)
    h = _hash32(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    return df.where(h < thr)


def cap_per_source(df: DataFrame, n_max: int,
                   source_col: str = "source",
                   id_col: str = "doc_id",
                   salt_buckets: int = 16) -> DataFrame:
    """Per-source quota — keep at most ``n_max`` rows per source, the
    RefinedWeb-style per-domain cap that stops one giant domain from
    dominating the mixture. Selection is deterministic: the ``n_max``
    rows with the smallest ``(md5-rank, id)`` within each source
    survive, so re-running the job keeps the identical subset and the
    result is a uniform random-looking sample of the source.

    Skew design (the reason this isn't one window): a hot source
    (10^9 docs from one domain at 100 TB) would funnel through a
    single task under ``row_number() OVER (PARTITION BY source)``.
    Phase 1 ranks within ``(source, hash % salt_buckets)`` — fan-out
    ``salt_buckets``× — and keeps ``n_max`` per salt, which provably
    contains every global top-``n_max`` candidate (any global winner
    is also within its own bucket's top ``n_max``). Phase 2 ranks the
    ≤ ``n_max × salt_buckets`` survivors per source — a bounded
    frame. Result is row-identical to the single-window formulation
    (the oracle's shape)."""
    h = _hash32(F.concat(F.col(source_col).cast("string"),
                         F.lit(" "),
                         F.col(id_col).cast("string")))
    from pyspark.sql import Window

    salted = Window.partitionBy(
        F.col(source_col), (h % salt_buckets)).orderBy(h.asc(),
                                                       F.col(id_col).asc())
    final = Window.partitionBy(F.col(source_col)).orderBy(
        h.asc(), F.col(id_col).asc())
    return (df.withColumn("_rs", F.row_number().over(salted))
              .where(F.col("_rs") <= n_max)
              .withColumn("_rf", F.row_number().over(final))
              .where(F.col("_rf") <= n_max)
              .drop("_rs", "_rf"))


def _bucket_counts(df: DataFrame, text_col: str, n: int, buckets: int,
                   id_col: str | None = None) -> DataFrame:
    """(bucket, cnt) — or (id, bucket, cnt) with ``id_col`` — hashed
    n-gram occurrence counts. Map-only up to the counting aggregate."""
    tmp = df.select(
        *( [F.col(id_col)] if id_col else [] ),
        F.col(text_col).alias("text"),
    ).withColumn("_id", F.lit(0) if id_col is None else F.col(id_col))
    grams = _raw_ngrams(tmp, "_id", "text", n)
    b = grams.select("_id", (_hash32(F.col("gram")) % buckets)
                     .alias("bucket"))
    keys = ["bucket"] if id_col is None else ["_id", "bucket"]
    out = b.groupBy(*keys).agg(F.count("*").alias("cnt"))
    if id_col is not None:
        out = out.withColumnRenamed("_id", id_col)
    return out


def importance_weights(docs: DataFrame, target: DataFrame, n: int = 1,
                       buckets: int = 256,
                       doc_id: str = "doc_id", text: str = "text",
                       target_text: str = "text") -> DataFrame:
    """DSIR log-likelihood-ratio score per document.

    Distributions use add-one smoothing over the ``buckets`` hashed
    n-gram buckets; the per-bucket ratio ``ln((tc+1)/(T+B)) −
    ln((rc+1)/(R+B))`` is quantized to integer 1e-4 nats and the
    per-doc score is the exact integer ``Σ count_b · ratio_b``
    (column ``score_unats``; divide by 1e4 for nats). Documents with
    no n-grams score 0."""
    tgt = _bucket_counts(target, target_text, n, buckets) \
        .withColumnRenamed("cnt", "tc")
    raw = _bucket_counts(docs, text, n, buckets) \
        .withColumnRenamed("cnt", "rc")
    # totals are 1-row dims; cross-joined onto the B-row bucket dim
    t_total = tgt.agg(F.sum("tc").alias("T"))
    r_total = raw.agg(F.sum("rc").alias("R"))
    dim = (raw.join(tgt, "bucket", "left")
           .crossJoin(F.broadcast(t_total))
           .crossJoin(F.broadcast(r_total))
           .select(
               "bucket",
               F.floor(
                   (F.log((F.coalesce("tc", F.lit(0)) + 1).cast("double")
                          / (F.col("T") + buckets))
                    - F.log((F.col("rc") + 1).cast("double")
                            / (F.col("R") + buckets))) * 1e4
                   + F.lit(0.5)).cast("bigint").alias("lr_unats")))
    per_doc = _bucket_counts(docs, text, n, buckets, id_col=doc_id)
    scores = (per_doc.join(F.broadcast(dim), "bucket")
              .groupBy(doc_id)
              .agg(F.sum(F.col("cnt") * F.col("lr_unats"))
                   .alias("score_unats")))
    return docs.select(doc_id).join(scores, doc_id, "left").select(
        doc_id,
        F.coalesce("score_unats", F.lit(0)).cast("bigint")
        .alias("score_unats"))


def shuffle_shards(df: DataFrame, n_shards: int,
                   id_col: str = "doc_id", salt: str = "") -> DataFrame:
    """Deterministic global shuffle + sharding — the "shuffle the
    corpus before training" step of every pretraining recipe, without
    ``rand()``: ``shuffle_key = md5(salt || id)`` (hex uniform, so
    lexicographic key order IS a reproducible random permutation),
    ``shard = hash32(key) % n_shards``, ``pos_in_shard`` = rank within
    the shard by ``(key, id)``. Changing ``salt`` reshuffles; re-running
    does not.

    Scale shape: ONE hash-partition Exchange on ``shard`` and
    ``n_shards`` parallel in-shard sorts — there is deliberately no
    global total order (a single ``orderBy(key)`` would range-exchange
    100 TB through a sampled boundary plan for no training benefit;
    readers consume shards independently and the permutation quality
    is the same)."""
    key = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    out = df.withColumn("shuffle_key", key)
    h = F.conv(F.substring(F.col("shuffle_key"), 1, 8), 16, 10) \
        .cast("bigint")
    out = out.withColumn("shard", (h % n_shards).cast("int"))
    from pyspark.sql import Window

    w = Window.partitionBy("shard").orderBy("shuffle_key", id_col)
    return out.withColumn(
        "pos_in_shard", F.row_number().over(w).cast("bigint"))


def epoch_upsample(df: DataFrame, weights: dict[str, float],
                   source_col: str = "source",
                   id_col: str = "doc_id", salt: str = "") -> DataFrame:
    """Fractional epoch mixture — the upsampling half of the mixture
    recipe (:func:`stratified_sample` is the downsampling half):
    a source with weight 2.5 is seen twice by every consumer plus a
    deterministic md5-selected half once more. Per row the epoch count
    is ``floor(w) + (hash32(salt || id) < frac(w) * 2^32)`` — exact
    integer threshold like stratified_sample — and the row explodes
    into ``epoch = 0 .. e-1`` copies. Sources absent from ``weights``
    are dropped; integer weights give exact copy counts.

    Scale: map-only (a when-chain over the broadcast-literal weight
    table + explode); output cardinality is Σ w_s·|s| — the rows any
    upsampler must emit."""
    full = {s: int(w) for s, w in weights.items()}
    thr = {s: min(_HASH_SPAN, int((w - int(w)) * _HASH_SPAN))
           for s, w in weights.items()}
    nf_col, thr_col = F.lit(0), F.lit(-1)
    for s in sorted(weights):
        nf_col = F.when(F.col(source_col) == s,
                        F.lit(full[s])).otherwise(nf_col)
        thr_col = F.when(F.col(source_col) == s,
                         F.lit(thr[s])).otherwise(thr_col)
    h = _hash32(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    e = nf_col + F.when(h < thr_col, F.lit(1)).otherwise(F.lit(0))
    return (df.withColumn("_e", e)
              .where(F.col("_e") > 0)
              .withColumn("epoch",
                          F.explode(F.sequence(F.lit(0),
                                               F.col("_e") - 1)))
              .drop("_e"))


def importance_resample(scores: DataFrame, n: int,
                        id_col: str = "doc_id",
                        score_col: str = "score_unats",
                        temperature: float = 1.0,
                        salt: str = "") -> DataFrame:
    """The RESAMPLING half of DSIR (:func:`importance_weights` is the
    scoring half): draw ``n`` documents without replacement with
    probability ∝ ``exp(score / temperature)`` via the Gumbel-top-k
    trick (Kool et al. 2019, public method) — ``key = score/T +
    Gumbel(0,1)``, take the n largest keys. The Gumbel noise is
    derived from the md5 uniform (``u = (hash32 + 0.5)/2^32``,
    ``g = -ln(-ln u)``), so the draw is deterministic: re-running
    selects the identical sample, a different ``salt`` redraws.

    Scale: ``orderBy().limit(n)`` plans TakeOrderedAndProject —
    per-partition top-n, driver merges n·P candidates; the corpus
    never globally sorts. Returns ``(id_col, score_col, key_r, rank)``
    with the key rounded to 1e-6 (ln ulp differences between engines
    are ~1e-16; rank ties would need key gaps at that scale).
    """
    if temperature <= 0:
        raise ValueError("temperature must be positive")
    u = (_hash32(F.concat(F.lit(salt), F.col(id_col).cast("string")))
         + F.lit(0.5)) / float(_HASH_SPAN)
    g = -F.log(-F.log(u))
    key = F.col(score_col) / (10000.0 * temperature) + g
    top = (scores.select(id_col, score_col, key.alias("_key"))
           .orderBy(F.desc("_key"), F.col(id_col)).limit(n))
    from pyspark.sql import Window

    # rank over the n survivors only (bounded single-task window)
    w = Window.orderBy(F.desc("_key"), F.col(id_col))
    return top.select(
        id_col, score_col,
        (F.floor(F.col("_key") * 1e6 + 0.5) / 1e6).alias("key_r"),
        F.row_number().over(w).cast("bigint").alias("rank"))


def domain_mixture(docs: DataFrame, lm_docs: DataFrame | None = None,
                   ref_weights: dict[str, float] | None = None,
                   eta: float = 1.0,
                   source_col: str = "source",
                   doc_id: str = "doc_id",
                   text: str = "text") -> DataFrame:
    """DoReMi-lite domain reweighting — ONE exponentiated-gradient
    step of the DoReMi mixture update (Xie et al. 2023, "DoReMi:
    Optimizing Data Mixtures Speeds Up Language Model Pretraining",
    public method): ``alpha'_d ∝ alpha_d · exp(eta · excess_d)`` where
    ``excess_d`` is the domain's clipped excess loss. Full DoReMi
    iterates this while training a proxy model; the sandbox stands in
    the proxy/reference pair with the deterministic bigram LM
    (:func:`jena_spark.data.lm.bigram_lm_scores` over ``lm_docs``,
    default the corpus itself), so ``excess_d`` = domain mean NLL −
    corpus mean NLL, clipped at 0 — domains the reference models WORSE
    than average get upweighted, exactly DoReMi's hard-domain signal.
    The output weight column feeds :func:`stratified_sample` /
    :func:`epoch_upsample` directly.

    Determinism: domain means are exact-integer micro-bits
    (``nll_ubits DIV n_bigrams`` — bigint floor division, identical in
    DuckDB as ``//``), so ``excess_ubits`` is engine-exact; only the
    final D-row softmax touches floats, and ``weight_r`` is rounded to
    1e-6 by the shared ``floor(x*1e6+0.5)/1e6`` recipe (ulp drift
    ~1e-16 can't flip it).

    Scale: everything after :func:`bigram_lm_scores` is one
    domain-keyed hash aggregation (D rows out) plus two broadcast
    1-row total dims — the 100 TB cost is the LM scoring pass, which
    is shared with the perplexity-filter step a pipeline already runs.

    ``ref_weights`` (default: the domain's token share, DoReMi's
    initialization) maps source → prior weight; listed domains missing
    from the data are ignored, data domains missing from the dict get
    prior 0 (dropped after normalization, like
    :func:`stratified_sample`'s absent-source rule).

    Returns ``(source, n_bigrams, nll_ubits, mean_ubits, excess_ubits,
    weight_r)``, one row per domain with ≥1 scored bigram.
    """
    from jena_spark.data.lm import bigram_lm_scores

    scores = bigram_lm_scores(docs, lm_docs, doc_id=doc_id, text=text)
    dom = (scores.join(docs.select(doc_id, source_col), doc_id)
           .groupBy(source_col)
           .agg(F.sum("n_bigrams").cast("bigint").alias("n_bigrams"),
                F.sum("nll_ubits").cast("bigint").alias("nll_ubits")))
    tot = dom.agg(F.sum("n_bigrams").alias("tn"),
                  F.sum("nll_ubits").alias("tnll"))
    mean_u = F.expr("nll_ubits DIV n_bigrams")
    gmean_u = F.expr("tnll DIV tn")
    if ref_weights is None:
        prior = F.col("n_bigrams").cast("double") / F.col("tn")
    else:
        prior = F.lit(0.0)
        for s, w in sorted(ref_weights.items()):
            prior = F.when(F.col(source_col) == s,
                           F.lit(float(w))).otherwise(prior)
    ex = (dom.crossJoin(F.broadcast(tot))
          .select(source_col, "n_bigrams", "nll_ubits",
                  mean_u.alias("mean_ubits"),
                  F.greatest(F.lit(0), mean_u - gmean_u)
                  .cast("bigint").alias("excess_ubits"),
                  (prior * F.exp(F.lit(float(eta))
                                 * F.greatest(F.lit(0), mean_u - gmean_u)
                                 / F.lit(1e6))).alias("_raw"))
          .where(F.col("_raw") > 0))
    z = ex.agg(F.sum("_raw").alias("_z"))
    return (ex.crossJoin(F.broadcast(z))
            .select(source_col, "n_bigrams", "nll_ubits", "mean_ubits",
                    "excess_ubits",
                    (F.floor(F.col("_raw") / F.col("_z") * 1e6 + 0.5)
                     / 1e6).alias("weight_r")))


def unimax_mixture(docs: DataFrame, budget: int, max_epochs: int = 4,
                   lang_col: str = "lang",
                   text_col: str = "text") -> DataFrame:
    """UniMax budget-capped language sampling (Chung et al. 2023,
    "UniMax: Fairer and More Effective Language Sampling for
    Large-Scale Multilingual Pretraining", public method): distribute
    a total token ``budget`` across languages as uniformly as
    possible, capping every language at ``max_epochs`` passes over its
    data — the water-filling allocation that replaced temperature
    sampling in mT5-class models (temperature sampling either starves
    tail languages or repeats them unboundedly; UniMax bounds repeats
    explicitly).

    Closed form instead of the paper's sequential loop: sort languages
    by ``cap = max_epochs * tokens`` ascending. A prefix of that order
    is "capped" (they cannot absorb their fair share); the remainder
    split the leftover budget equally. Language *j* (1-based, running
    cap cumsum ``cum_j``) is capped iff

        ``cap_j * (L - j + 1) + cum_{j-1} <= budget``

    and the condition is monotone along the sort, so one running-AND
    window finds the capped prefix and a second full-frame window
    sizes the leftover — both over the **L-row language dim** (the
    only corpus-scale work is the token-count aggregation; the
    windows touch L rows, never the corpus, so the single-partition
    window is bounded by construction).

    Exact integer arithmetic throughout (the uncapped share is
    ``(budget - capped_sum) DIV (L - k)``, floor division;
    ``epochs_micro = alloc * 1e6 DIV tokens`` computed in decimal so
    it cannot overflow at 100 TB token counts). If ``budget`` exceeds
    the total capped supply, every language allocates its cap and the
    remainder is deliberately unspent (the paper's behavior — repeats
    are bounded even when the budget isn't).

    Returns one row per language: ``(lang, tokens, cap_tokens,
    alloc_tokens, epochs_micro)``.
    """
    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    if max_epochs <= 0:
        raise ValueError(f"max_epochs must be positive, got {max_epochs}")
    from jena_spark.data.pack import token_counts

    t = (docs.groupBy(F.col(lang_col).alias("lang"))
         .agg(F.sum(token_counts(docs, text_col))
              .cast("bigint").alias("tokens"))
         .withColumn("cap_tokens",
                     (F.col("tokens") * max_epochs).cast("bigint")))
    from pyspark.sql import Window

    # every window carries an explicit constant partition: identical
    # single-partition semantics, but no per-row WindowExec warning
    order = [F.col("cap_tokens").asc(), F.col("lang").asc()]
    run = (Window.partitionBy(F.lit(1)).orderBy(*order)
           .rowsBetween(Window.unboundedPreceding, 0))
    whole = Window.partitionBy(F.lit(1))
    b = F.lit(int(budget))
    t = (t.withColumn("_i", F.row_number().over(
            Window.partitionBy(F.lit(1)).orderBy(*order)))
         .withColumn("_cum", F.sum("cap_tokens").over(run))
         .withColumn("_L", F.count("*").over(whole)))
    fits = (F.col("cap_tokens") * (F.col("_L") - F.col("_i") + 1)
            + (F.col("_cum") - F.col("cap_tokens"))) <= b
    t = (t.withColumn("_viol", F.when(fits, F.lit(0)).otherwise(F.lit(1)))
         .withColumn("_capped", (F.sum("_viol").over(run) == 0)))
    t = (t.withColumn("_k", F.sum(F.col("_capped").cast("int")).over(whole))
         .withColumn("_capsum",
                     F.sum(F.when(F.col("_capped"), F.col("cap_tokens"))
                           .otherwise(F.lit(0))).over(whole)))
    alloc = F.when(F.col("_capped"), F.col("cap_tokens")).otherwise(
        F.expr("(CAST(_b AS BIGINT) - _capsum) DIV (_L - _k)"))
    return (t.withColumn("_b", b)
            .withColumn("alloc_tokens", alloc.cast("bigint"))
            .select("lang", "tokens", "cap_tokens", "alloc_tokens",
                    F.floor(F.col("alloc_tokens").cast("decimal(38,0)")
                            * 1000000 / F.col("tokens"))
                    .cast("bigint").alias("epochs_micro")))


def temperature_mixture(docs: DataFrame, source: str = "source",
                        id_col: str = "doc_id") -> DataFrame:
    """``(source, n_docs, raw_share_ppm, temp_share_ppm)`` —
    temperature-scaled source sampling weights at τ=2, i.e.
    ``p_s ∝ sqrt(n_s)`` (the multilingual-sampling family of
    mT5/XLM-R, the knob between proportional and uniform;
    :func:`unimax` solves the budget-capped variant, this the
    smooth one).

    τ is FIXED at 2 because that is the exactly-computable special
    case: IEEE ``sqrt`` is correctly rounded in both engines, so
    ``w_s = floor(sqrt(n_s)·10^6 + 0.5)`` is bit-identical, and the
    shares are integer ratios of integer sums — a fractional
    ``pow(x, 1/τ)`` would hang cross-engine parity on libm rounding
    (the determinism contract every operator here keeps).

    One partial-agg census + scalar arithmetic against a broadcast
    1-row total; source cardinality bounds everything downstream.
    """
    cnt = docs.groupBy(source).agg(
        F.count("*").cast("long").alias("n_docs"))
    w_u = F.expr("CAST(floor(sqrt(CAST(n_docs AS DOUBLE)) * 1000000"
                 " + 0.5) AS BIGINT)")
    cnt = cnt.withColumn("_w", w_u)
    tot = cnt.agg(F.sum("n_docs").alias("_n"),
                  F.sum("_w").alias("_wsum"))
    return (cnt.crossJoin(F.broadcast(tot))
            .select(source, "n_docs",
                    F.expr("(1000000 * n_docs) div _n").cast("long")
                    .alias("raw_share_ppm"),
                    F.expr("(1000000 * _w) div _wsum").cast("long")
                    .alias("temp_share_ppm")))


def temperature_mixture_sql(docs_cte: str,
                            source: str = "source") -> str:
    """DuckDB twin of :func:`temperature_mixture` (identical sqrt
    quantization)."""
    return f"""WITH docs AS ({docs_cte}),
cnt AS (
  SELECT {source} AS src, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(floor(sqrt(CAST(count(*) AS DOUBLE)) * 1000000 + 0.5)
              AS BIGINT) AS w
  FROM docs GROUP BY {source}),
tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n,
               CAST(sum(w) AS BIGINT) AS wsum FROM cnt)
SELECT src AS {source}, n_docs,
       (1000000 * n_docs) // n AS raw_share_ppm,
       (1000000 * w) // wsum AS temp_share_ppm
FROM cnt, tot"""
