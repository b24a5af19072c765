"""Similarity search over an embedding column (array<float>).

* :func:`brute_topk` — exact cosine top-k; the correctness baseline.
  For a single query vector this is a scan + TakeOrderedAndProject
  (no shuffle of the corpus).
* :func:`lsh_topk` — random-hyperplane LSH bucketing: candidates are
  corpus vectors sharing a hash bucket (multi-probe over tables), then
  exact re-rank. This is the scale path: the corpus is bucketed ONCE
  (write-time at 100 TB), queries touch only their buckets.
* :func:`ivf_assign` / :func:`ivf_topk` — IVF-style coarse quantizer:
  assign vectors to the nearest of k seed centroids (deterministic
  seeds = first k vectors by id), probe the closest n_probe cells.

Randomness is derived from numpy with a fixed seed so plans are
deterministic and resumable (Date/Math.random-free, like everything
else in the engine).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from jena_spark.data.dedup import cosine


def _as_double(vec_col: str):
    return F.transform(F.col(vec_col), lambda x: x.cast("double"))


def brute_topk(
    embeddings: DataFrame, query: list[float], k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k for one query vector (JVM-side arithmetic)."""
    q = F.array(*[F.lit(float(x)) for x in query])
    scored = embeddings.select(
        F.col(id_col),
        F.round(cosine(_as_double(vec_col), q), 6).alias("cos"),
    )
    return scored.orderBy(F.desc("cos"), F.col(id_col)).limit(k)


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def lsh_bucket_expr(vec_col: str, planes: np.ndarray):
    """Sign-bit bucket id for one table of hyperplanes (JVM arithmetic:
    the plane matrix unrolls into literal arrays — fine for <=32 planes)."""
    bits = []
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(float(x)) for x in plane])
        dot = F.aggregate(
            F.zip_with(_as_double(vec_col), p, lambda x, y: x * y),
            F.lit(0.0), lambda s, x: s + x,
        )
        bits.append(F.when(dot >= 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(F.lit(0).cast("long")))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def lsh_assign(
    embeddings: DataFrame, n_planes: int = 12, n_tables: int = 4, seed: int = 42,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Corpus-side bucketing: (id, table, bucket). At scale this is the
    write-time index (bucket = Iceberg partition key)."""
    dim = len(embeddings.select(vec_col).first()[0])
    out = None
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_planes, seed + t)
        part = embeddings.select(
            F.col(id_col).alias("id"), F.lit(t).alias("table"),
            lsh_bucket_expr(vec_col, planes).alias("bucket"),
        )
        out = part if out is None else out.unionByName(part)
    return out


def lsh_topk(
    embeddings: DataFrame, query: list[float], k: int = 10,
    n_planes: int = 12, n_tables: int = 4, seed: int = 42,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """ANN: union of the query's buckets across tables, exact re-rank."""
    assigns = lsh_assign(embeddings, n_planes, n_tables, seed, id_col, vec_col)
    qrow = [(list(map(float, query)),)]
    spark = embeddings.sparkSession
    qdf = spark.createDataFrame(qrow, "embedding array<double>")
    q_assign = lsh_assign(qdf.withColumn("vec_id", F.lit(-1)), n_planes, n_tables, seed)
    cand_ids = (
        assigns.join(
            F.broadcast(q_assign.select("table", "bucket")), ["table", "bucket"]
        )
        .select("id").distinct()
    )
    cands = embeddings.join(
        cand_ids.withColumnRenamed("id", id_col), id_col
    )
    return brute_topk(cands, query, k, id_col, vec_col)


def embedding_near_dups_lsh(
    embeddings: DataFrame, threshold: float = 0.9,
    n_planes: int = 12, n_tables: int = 4, seed: int = 42,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Scale path for embedding near-dup: candidates are pairs sharing
    any LSH bucket (probability grows with cosine — random-hyperplane
    collision prob is ``(1 - θ/π)^planes`` per table), verified with
    exact cosine. Replaces the brute-force O(n²) cross join with a
    bucket-equality join: at 10⁹ vectors the candidate set is the only
    thing that ever shuffles. Recall is tunable via planes/tables;
    verification keeps precision exact."""
    assigns = lsh_assign(embeddings, n_planes, n_tables, seed, id_col, vec_col)
    a, b = assigns.alias("a"), assigns.alias("b")
    cands = (
        a.join(b, (F.col("a.table") == F.col("b.table"))
               & (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    e = embeddings.select(F.col(id_col).alias("id"), _as_double(vec_col).alias("v"))
    ea = e.select(F.col("id").alias("id_a"), F.col("v").alias("va"))
    eb = e.select(F.col("id").alias("id_b"), F.col("v").alias("vb"))
    return (
        cands.join(ea, "id_a").join(eb, "id_b")
        .select("id_a", "id_b",
                F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cos"))
        .where(F.col("cos") >= threshold)
    )


def ivf_assign(
    embeddings: DataFrame, n_cells: int = 16,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> tuple[DataFrame, list[list[float]]]:
    """Assign each vector to its nearest seed centroid (centroids =
    first n_cells vectors by id — deterministic; real system would
    k-means, same plumbing)."""
    seeds = [
        [float(x) for x in r[vec_col]]
        for r in embeddings.orderBy(id_col).limit(n_cells).collect()
    ]
    # argmax over an array of cell cosines — each cosine expression
    # appears exactly once (a chained when().otherwise() would embed
    # the running best twice per step: 2^n expression blow-up)
    cos_arr = F.array(*[
        cosine(_as_double(vec_col), F.array(*[F.lit(x) for x in c])) for c in seeds
    ])
    cell = (F.array_position(cos_arr, F.array_max(cos_arr)) - 1).cast("int")
    return (
        embeddings.select(F.col(id_col).alias("id"), cell.alias("cell")),
        seeds,
    )


def ivf_topk(
    embeddings: DataFrame, query: list[float], k: int = 10, n_cells: int = 16,
    n_probe: int = 4, id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    assigned, seeds = ivf_assign(embeddings, n_cells, id_col, vec_col)
    qv = np.array(query, dtype=float)

    def cos_np(c):
        c = np.array(c)
        return float(c @ qv / (np.linalg.norm(c) * np.linalg.norm(qv) + 1e-12))

    probe = sorted(range(len(seeds)), key=lambda i: -cos_np(seeds[i]))[:n_probe]
    cand = assigned.where(F.col("cell").isin(probe)).select("id")
    cands = embeddings.join(cand.withColumnRenamed("id", id_col), id_col)
    return brute_topk(cands, query, k, id_col, vec_col)


def semdedup(
    embeddings: DataFrame, n_cells: int = 16, threshold: float = 0.95,
    id_col: str = "vec_id", vec_col: str = "embedding",
    train_iters: int = 0,
) -> DataFrame:
    """SemDedup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication in embedding space — cluster the corpus, then look
    for cosine near-duplicates WITHIN each cluster only, and keep one
    survivor per duplicate group.

    Composition of the engine's existing scale paths: the coarse
    quantizer is :func:`ivf_assign` (nearest of ``n_cells``
    deterministic seed centroids — a broadcast of k vectors, one
    map-side pass over the corpus), the candidate pair generation is a
    cell-equality self-join (pairwise work bounded per cell, never
    all-pairs — at 100 TB you raise ``n_cells`` ~ sqrt(n) so cells
    stay executor-sized), and survivor election is
    :func:`jena_spark.data.dedup.dedup_clusters` (the sameAs
    connected-components machinery, min-id representative).

    Returns ``(id_col, cell, cluster, keep)``: ``cell`` the quantizer
    cell, ``cluster`` the min member id of the duplicate component,
    ``keep`` true for the elected survivor (singletons keep
    themselves). Cross-cell near-dups are invisible by construction —
    the paper's precision/recall trade; the brute-force twin
    (:func:`jena_spark.data.dedup.embedding_near_dups`) is the recall
    oracle in tests.
    """
    from jena_spark.data.dedup import dedup_clusters

    # the assigned frame feeds FOUR consumers (both self-join sides,
    # the singleton fill, the final cell join) and Spark replays a
    # subtree once per consumer — without a checkpoint the 16-cosine
    # assignment codegen runs 4x (measured 23.8s -> ~8s at sf0.1).
    # One narrow pass over the corpus, standard at scale too.
    # train_iters > 0 swaps the raw seed quantizer for the TRAINED one
    # (the paper's actual clustering step): Lloyd-iterated centroids
    # from :func:`kmeans`, same broadcast-literal assignment shape.
    if train_iters:
        km, _cents = kmeans(embeddings, k=n_cells, n_iter=train_iters,
                            id_col=id_col, vec_col=vec_col)
        assigned = km.select(F.col(id_col).alias("id"),
                             F.col("cluster").alias("cell"))
    else:
        assigned, _ = ivf_assign(embeddings, n_cells, id_col, vec_col)
    e = (
        embeddings.select(F.col(id_col).alias("id"),
                          _as_double(vec_col).alias("v"))
        .join(assigned, "id")
        .localCheckpoint(eager=False)
    )
    assigned = e.select("id", "cell")
    a, b = e.alias("a"), e.alias("b")
    pairs = (
        a.join(b, (F.col("a.cell") == F.col("b.cell"))
               & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("doc_a"), F.col("b.id").alias("doc_b"),
                F.round(cosine(F.col("a.v"), F.col("b.v")), 6).alias("cos"))
        .where(F.col("cos") >= threshold)
        .select("doc_a", "doc_b")
        # consumed twice inside dedup_clusters (the negative-id guard
        # + the edge list) and each replay is the full pairwise join
        .localCheckpoint(eager=False)
    )
    clusters = dedup_clusters(
        pairs, docs=embeddings.withColumnRenamed(id_col, "doc_id"))
    return (
        clusters.withColumnRenamed("doc_id", id_col)
        .join(assigned.withColumnRenamed("id", id_col), id_col)
        .select(id_col, "cell", "cluster", "keep")
    )


def _assign_cluster(v_col, centroids):
    """(cluster, cos) for the nearest centroid by cosine. Argmax is
    array_position(arr, array_max(arr)) — first max wins, so ties break
    toward the LOWEST cluster id, mirroring the oracle's
    ``ORDER BY cos DESC, c``. Each cosine expression appears exactly
    once (see ivf_assign's 2^n note on chained when())."""
    cos_arr = F.array(*[
        cosine(v_col, F.array(*[F.lit(float(x)) for x in c]))
        for c in centroids
    ])
    cluster = (F.array_position(cos_arr, F.array_max(cos_arr)) - 1).cast("int")
    return cluster, cos_arr


def kmeans(
    embeddings: DataFrame, k: int = 4, n_iter: int = 2,
    id_col: str = "vec_id", vec_col: str = "embedding",
    quant: int = 1_000_000,
) -> tuple[DataFrame, list[list[float]]]:
    """Spherical k-means (Lloyd's) over the embedding column — the
    trained version of :func:`ivf_assign`'s coarse quantizer (reference
    semantics: the clustering step of SemDedup, arXiv:2303.09540 §3).

    Determinism contract (the whole point of this variant):

    * seeds = the first ``k`` vectors by ``id_col`` — no RNG;
    * the centroid update is EXACT integer arithmetic: each component
      is ``sum(floor(x * quant + 0.5)::long) / (quant * n)`` over the
      members, so the result is independent of partition count, task
      order and engine (float sums are not associative; quantized
      BIGINT sums are). The DuckDB oracle evaluates the identical
      expressions and hash-matches.

    Scale shape: per iteration one map-side assignment pass (k
    broadcast-literal cosines, whole-stage codegen) + one
    (cluster, pos) hash aggregation whose output is k×dim rows — the
    centroids always fit on the driver, the corpus never shuffles
    except by the k×dim-row agg. This is exactly Spark MLlib's KMeans
    loop posture, minus its RNG.

    Returns ``(assignments, centroids)``: assignments =
    ``(id_col, cluster int, cos_r double)`` against the FINAL
    centroids, ``cos_r`` rounded ``floor(x*1e4 + 0.5)/1e4``.
    """
    e = embeddings.select(
        F.col(id_col).alias("id"), _as_double(vec_col).alias("v"),
    ).localCheckpoint(eager=False)  # consumed 2*n_iter + 2 times
    cents = [
        [float(x) for x in r["v"]]
        for r in e.orderBy("id").limit(k).collect()
    ]
    if len(cents) < k:
        raise ValueError(
            f"kmeans: k={k} but only {len(cents)} vectors — seeds are "
            "the first k vectors by id and cannot be synthesized")
    dim = len(cents[0])
    for _ in range(n_iter):
        cluster, _arr = _assign_cluster(F.col("v"), cents)
        assigned = e.select("id", cluster.alias("c"))
        rows = (
            e.join(assigned, "id")
            .select("c", F.posexplode("v").alias("pos", "x"))
            .groupBy("c", "pos")
            .agg(
                F.sum(F.floor(F.col("x") * quant + F.lit(0.5))
                      .cast("long")).alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        )
        by_c: dict[int, dict[int, float]] = {}
        for r in rows:
            # double division of exact integers — bit-identical to the
            # oracle's CAST(s AS DOUBLE) / (quant * n)
            by_c.setdefault(r["c"], {})[r["pos"]] = r["s"] / (float(quant) * r["n"])
        cents = [
            [by_c[c][p] for p in range(dim)] if c in by_c else cents[c]
            for c in range(k)
        ]
    cluster, cos_arr = _assign_cluster(F.col("v"), cents)
    out = e.select(
        F.col("id").alias(id_col), cluster.alias("cluster"),
        (F.floor(F.element_at(cos_arr, cluster + 1) * 10000.0 + 0.5)
         / 10000.0).alias("cos_r"),
    )
    return out, cents


def dim_truncation_eval(
    embeddings: DataFrame, dims: tuple[int, ...] = (8, 16, 32),
    k: int = 10, n_queries: int = 8,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Matryoshka-style dimension-truncation QA: how much of the
    exact cosine top-``k`` survives when vectors are cut to their
    first ``d`` coordinates — the retrieval-quality check run before
    shipping truncated embeddings (MRL, Kusupati et al. 2022) or
    choosing an IVF coarse dim.

    Returns ``(d, query_id, n_common, overlap_ppm)``: per query
    (``vec_id < n_queries``, the data_ann_topk query-set convention)
    and per ``d``, the size of the intersection between the top-``k``
    under full-dimension cosine and under ``d``-dim cosine over the
    corpus (``vec_id >= n_queries``), and its integer-ppm share of
    ``k``. Ranks break ties by neighbor id, so membership is
    deterministic (the ann-oracle precedent).

    Distributed shape: ONE broadcast of the bounded query set against
    a corpus scan computes every cosine (full + each d) in a single
    projection; per-(d, query) top-k is a window over k-bounded
    groups. This is the exact-baseline QA pass — the serving path at
    scale stays LSH/IVF.
    """
    if k <= 0 or n_queries <= 0:
        raise ValueError(f"bad k={k} / n_queries={n_queries}")
    if not dims or any(d <= 0 for d in dims):
        raise ValueError(f"dims must be positive, got {dims}")
    e = embeddings.select(id_col, _as_double(vec_col).alias("_v"))
    q = (e.where(F.col(id_col) < n_queries)
         .select(F.col(id_col).alias("_qid"), F.col("_v").alias("_qv")))
    c = (e.where(F.col(id_col) >= n_queries)
         .select(F.col(id_col).alias("_nid"), F.col("_v").alias("_cv")))
    # round to 6 dp BEFORE the rank tie-break: Spark's fold-sum dot
    # product and DuckDB's list_cosine_similarity can differ in the
    # last ulp on near-equal cosines, flipping top-k membership — the
    # embedding_near_dups / decontaminate_semantic rounding precedent
    proj = [F.round(cosine(F.col("_qv"), F.col("_cv")), 6)
            .alias("_cos_full")]
    for d in dims:
        proj.append(F.round(cosine(F.slice("_qv", 1, d),
                                   F.slice("_cv", 1, d)), 6)
                    .alias(f"_cos_{d}"))
    pairs = c.crossJoin(F.broadcast(q)).select("_qid", "_nid", *proj) \
        .localCheckpoint()

    def topk(col, label):
        w = Window.partitionBy("_qid").orderBy(
            F.col(col).desc(), F.col("_nid").asc())
        return (pairs.withColumn("_r", F.row_number().over(w))
                .where(F.col("_r") <= k)
                .select(F.lit(label).alias("d"), "_qid", "_nid"))

    full = topk("_cos_full", 0).select(
        F.col("_qid").alias("_fq"), F.col("_nid").alias("_fn"))
    out = None
    for d in dims:
        t = topk(f"_cos_{d}", d)
        out = t if out is None else out.unionByName(t)
    common = (out.join(full, (F.col("_qid") == F.col("_fq"))
                       & (F.col("_nid") == F.col("_fn")))
              .groupBy("d", "_qid")
              .agg(F.count("*").cast("long").alias("n_common")))
    # every (d, query) gets a row even at zero overlap
    base = None
    for d in dims:
        b = q.select(F.lit(d).alias("d"), F.col("_qid"))
        base = b if base is None else base.unionByName(b)
    return (base.join(common, ["d", "_qid"], "left")
            .select(F.col("d").cast("int"),
                    F.col("_qid").alias("query_id"),
                    F.coalesce("n_common", F.lit(0)).cast("long")
                    .alias("n_common"),
                    F.expr(f"(1000000 * coalesce(n_common, 0)) div {k}")
                    .cast("long").alias("overlap_ppm")))


def dim_truncation_eval_sql(dims: tuple[int, ...] = (8, 16, 32),
                            k: int = 10, n_queries: int = 8) -> str:
    """DuckDB twin of :func:`dim_truncation_eval` over the
    ``embeddings`` view (``list_slice`` + ``list_cosine_similarity``,
    same deterministic tie-breaks)."""
    cos_cols = ",\n         ".join(
        f"round(list_cosine_similarity(list_slice(q.v, 1, {d}),"
        f" list_slice(c.v, 1, {d})), 6) AS cos_{d}" for d in dims)
    tops = []
    for d in dims:
        tops.append(f"""t_{d} AS (
  SELECT {d} AS d, qid, nid FROM (
    SELECT qid, nid, row_number() OVER (PARTITION BY qid
           ORDER BY cos_{d} DESC, nid) AS r FROM pairs)
  WHERE r <= {k})""")
    unions = "\nUNION ALL\n".join(f"SELECT * FROM t_{d}" for d in dims)
    return f"""WITH e AS (SELECT vec_id,
          CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
pairs AS MATERIALIZED (
  SELECT q.vec_id AS qid, c.vec_id AS nid,
         round(list_cosine_similarity(q.v, c.v), 6) AS cos_full,
         {cos_cols}
  FROM e q, e c WHERE q.vec_id < {n_queries} AND c.vec_id >= {n_queries}),
full_t AS (
  SELECT qid AS fq, nid AS fn FROM (
    SELECT qid, nid, row_number() OVER (PARTITION BY qid
           ORDER BY cos_full DESC, nid) AS r FROM pairs)
  WHERE r <= {k}),
{",".join(tops)},
allt AS ({unions}),
common AS (
  SELECT d, qid, CAST(count(*) AS BIGINT) AS n_common
  FROM allt JOIN full_t ON allt.qid = full_t.fq AND allt.nid = full_t.fn
  GROUP BY d, qid),
base AS (
  SELECT d, vec_id AS qid
  FROM (SELECT DISTINCT vec_id FROM e WHERE vec_id < {n_queries}),
       (SELECT unnest(ARRAY[{", ".join(str(d) for d in dims)}]) AS d))
SELECT CAST(base.d AS INT) AS d, base.qid AS query_id,
       CAST(coalesce(common.n_common, 0) AS BIGINT) AS n_common,
       (1000000 * coalesce(common.n_common, 0)) // {k} AS overlap_ppm
FROM base LEFT JOIN common
  ON base.d = common.d AND base.qid = common.qid"""
