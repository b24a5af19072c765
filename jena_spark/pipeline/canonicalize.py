"""owl:sameAs canonicalization via distributed connected components.

Reference precedent: Jena's rule reasoner declares ``owl:sameAs``
symmetric/transitive and propagates it
(``jena-core/src/main/resources/etc/owl-fb.rules:157,424-431``). At
Spark scale that closure is connected components over the equivalence
edge set; we implement the **alternating large-star / small-star**
algorithm (Kiveris et al., "Connected Components in MapReduce and
Beyond", SoCC'14) — O(log n) rounds regardless of component diameter,
each round two shuffles, which is what survives a 100 TB edge set
(naive label propagation is O(diameter) rounds and dies on chains).

Representative choice: lexicographically smallest member (strings order
identically in Python and the JVM for our ASCII IRIs — the oracle uses
the same rule). IDs stay strings in v1 for correctness/debuggability;
a 64-bit dictionary encoding (cf. TDB NodeId,
``jena-tdb/.../store/NodeId.java:115-152``) is the documented perf
follow-up for join-heavy stages.

Skew note (north rule): hot entities produce high-degree stars. The
groupBy in each round is a partial-aggregable min — Spark's map-side
combine absorbs the skew before shuffle; the final rewrite join
broadcasts the mapping when small and otherwise relies on AQE skew-join
splitting (enabled in session.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jena_spark import terms as TM


def _large_star(e: DataFrame) -> DataFrame:
    """Connect all strictly-larger neighbors to the neighborhood min."""
    und = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    mins = (
        und.groupBy("src")
        .agg(F.min("dst").alias("mn"))
        .select("src", F.least("mn", "src").alias("m"))
    )
    return (
        und.join(mins, "src")
        .where(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Connect all smaller-or-equal neighbors (and self) to the min."""
    d = e.select(
        F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
    )
    mins = d.groupBy("src").agg(F.min("dst").alias("m"))
    out = (
        d.join(mins, "src")
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .union(mins.select(F.col("src"), F.col("m").alias("dst")))
    )
    return out.where(F.col("src") != F.col("dst")).distinct()


def _signature(e: DataFrame) -> tuple[int, int]:
    row = e.select(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.bit_xor(F.xxhash64("src", "dst")), F.lit(0)).alias("h"),
    ).collect()[0]
    return (row["n"], row["h"])


def _unionfind(pairs: list[tuple[str, str]]) -> dict[str, str]:
    """Driver-side union-find, representative = lexicographic min member
    (identical semantics to the distributed path and the oracle)."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {n: find(n) for n in parent}


def connected_components(
    edges: DataFrame, max_iter: int = 25, driver_threshold: int = 1_000_000
) -> DataFrame:
    """edges(src,dst) -> mapping(node, component) with component = min member.

    Hybrid execution: after dedup, an edge set that fits comfortably on
    the driver (``<= driver_threshold`` edges — the entity-equivalence
    graph is orders of magnitude smaller than the triple set) is solved
    with a single collect + union-find, avoiding O(log n) whole-cluster
    rounds for a tiny graph. Above the threshold, the alternating
    large-star/small-star iteration runs fully distributed. Both paths
    produce the identical mapping (min-member representative).

    Only nodes that appear in an edge are returned (isolated nodes map
    to themselves implicitly). Each distributed round is
    localCheckpoint'ed to cut lineage — at cluster scale this would be
    ``df.checkpoint()`` to a reliable store, which is also the
    per-round resume point.
    """
    spark = edges.sparkSession
    e = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_edges = e.count()
    if n_edges == 0:
        return spark.createDataFrame([], "node string, component string")
    if n_edges <= driver_threshold:
        mapping = _unionfind([(r["src"], r["dst"]) for r in e.collect()])
        return spark.createDataFrame(
            sorted(mapping.items()), "node string, component string"
        )
    # NOTE: the distributed path below also self-maps representatives
    # (rep -> rep) before returning, matching the driver path — the
    # rewrite in canonicalize_triples relies on "mapping hit" meaning
    # "this IRI belongs to some equivalence component".
    #
    # Dictionary-encoded iteration (TDB NodeId posture): the
    # large-star/small-star rounds shuffle 16-byte (src, dst) long
    # pairs instead of IRI strings — component MEMBERSHIP is invariant
    # under any total order of node ids, so iterating on xxhash64 ids
    # is sound; the min-STRING representative (the semantics the driver
    # path and the oracle use) is re-elected per component at decode
    # time with one aggregation.
    from jena_spark.pipeline.encode import term_id_col

    null_s = F.lit(None).cast("string")
    nodes = (
        e.select(F.col("src").alias("val"))
        .union(e.select(F.col("dst").alias("val")))
        .distinct()
        .select(term_id_col(F.lit("n"), F.col("val"), null_s, null_s).alias("node_id"),
                "val")
        .localCheckpoint(eager=True)
    )
    enc = e.select(
        term_id_col(F.lit("n"), F.col("src"), null_s, null_s).alias("src"),
        term_id_col(F.lit("n"), F.col("dst"), null_s, null_s).alias("dst"),
    ).localCheckpoint(eager=True)
    sig = _signature(enc)
    for _ in range(max_iter):
        enc = _small_star(_large_star(enc)).localCheckpoint(eager=True)
        new_sig = _signature(enc)
        if new_sig == sig:
            break
        sig = new_sig
    # fixpoint: every edge is (node_id -> root_id); add root self-maps
    memb = (
        enc.select(F.col("src").alias("node_id"), F.col("dst").alias("root_id"))
        .union(enc.select(F.col("dst").alias("node_id"), F.col("dst").alias("root_id")))
        .distinct()
    )
    named = memb.join(nodes, "node_id").select("root_id", F.col("val").alias("node"))
    reps = named.groupBy("root_id").agg(F.min("node").alias("component"))
    return named.join(reps, "root_id").select("node", "component").distinct()


def sameas_edges(triples: DataFrame) -> DataFrame:
    return (
        triples.where(
            (F.col("p_val") == TM.OWL_SAMEAS)
            & (F.col("s_kind") == "iri")
            & (F.col("o_kind") == "iri")
        )
        .select(F.col("s_val").alias("src"), F.col("o_val").alias("dst"))
        .distinct()
    )


def present_rep_dim(mentions: DataFrame, gazetteer: dict | None = None) -> DataFrame:
    """(surface, representative-IRI) dimension for the surfaces PRESENT
    in the mention table — the exact mapping the data-derived sameAs
    closure produces, without scanning the triple table.

    Subtlety this encodes (caught by a fresh-seed verify run): the
    component representative is the lexicographic min of the members
    that OCCUR IN THE DATA, not of the full gazetteer component — a
    full-gazetteer mapping can elect a representative IRI that never
    occurs (e.g. component {new_york, new_york_city, nyc} with only
    'NYC' and 'New York City' in the corpus: data rep = new_york_city,
    full-gazetteer rep = new_york). The emitted sameAs edges are
    exactly {(iri(s), iri(canonical(s))) : s present}, so union-find
    over those — seeded from the distinct present surfaces — is
    identical to the generic ``connected_components(sameas_edges(raw))``.

    Cost model: the distinct-surface set is bounded by the gazetteer
    (mentions only ever contain gazetteer surfaces), so the collect is
    O(|gazetteer|) regardless of corpus size; ``mentions`` is persisted
    by the callers, so the job this triggers is the same extraction
    materialization the main pass needs anyway.
    """
    spark = mentions.sparkSession
    present = sorted(
        r["surface"] for r in mentions.select("surface").distinct().collect()
    )
    rows = present_rep_rows(present, gazetteer)
    return spark.createDataFrame(rows, "surface string, rep string")


def present_rep_rows(present: list[str],
                     gazetteer: dict | None = None) -> list[tuple[str, str]]:
    """Pure-Python core of :func:`present_rep_dim`: (surface, rep)
    pairs for a given present-surface list — shared by the batch path
    and :func:`construct_incremental`'s re-election delta."""
    from jena_spark.gazetteer import DEFAULT_GAZETTEER, validate_gazetteer

    s2c = validate_gazetteer(gazetteer or DEFAULT_GAZETTEER)
    present = sorted(present)
    edges = [
        (TM.entity_iri(s), TM.entity_iri(s2c[s]))
        for s in present
        if TM.entity_iri(s) != TM.entity_iri(s2c[s])
    ]
    comp = _unionfind(edges)
    return [(s, comp.get(TM.entity_iri(s), TM.entity_iri(s))) for s in present]


def canonicalize_triples(triples: DataFrame, mapping: DataFrame | None = None) -> DataFrame:
    """Rewrite IRI subjects/objects to component representatives.

    The mapping is broadcast: it covers only entity IRIs participating
    in equivalences — orders of magnitude smaller than the triple set.
    Self-referential sameAs triples vanish after rewriting (closure
    semantics, cf. oracle).

    Shuffle design (input contract: ``triples`` is already a set, which
    :func:`jena_spark.pipeline.extract.raw_triples` guarantees by
    construction): rewriting can only create duplicates among rows that
    touch an equivalence component — i.e. rows whose subject or object
    IRI has a mapping entry (the mapping self-maps representatives, so
    "hit" ⇔ "in some component"). Untouched rows cannot equal a
    rewritten row (rewritten rows carry a component IRI in the rewritten
    position; untouched rows by definition contain none), so only the
    touched fraction is dedup-shuffled and the bulk of the table streams
    through with no shuffle at all.
    """
    if mapping is None:
        mapping = connected_components(sameas_edges(triples))
    # lineage columns are carried when present (the pipeline path) and
    # simply absent for bare 7-column Graph-API frames (e.g. the output
    # of inference.owl_functional_sameas unioned onto a loaded graph)
    lineage = [c for c in ("graph", "conv_id") if c in triples.columns]
    s_map = F.broadcast(mapping.withColumnRenamed("node", "s_val")
                        .withColumnRenamed("component", "s_canon"))
    o_map = F.broadcast(mapping.withColumnRenamed("node", "o_val")
                        .withColumnRenamed("component", "o_canon"))
    joined = (
        triples.join(s_map, ["s_val"], "left")
        .join(o_map, ["o_val"], "left")
        .select(
            F.col("s_kind"),
            F.when(F.col("s_kind") == "iri", F.coalesce("s_canon", "s_val"))
            .otherwise(F.col("s_val")).alias("s_val"),
            F.col("p_val"),
            F.col("o_kind"),
            F.when(F.col("o_kind") == "iri", F.coalesce("o_canon", "o_val"))
            .otherwise(F.col("o_val")).alias("o_val"),
            F.col("o_datatype"), F.col("o_lang"),
            *[F.col(c) for c in lineage],
            (
                ((F.col("s_kind") == "iri") & F.col("s_canon").isNotNull())
                | ((F.col("o_kind") == "iri") & F.col("o_canon").isNotNull())
            ).alias("_touched"),
        )
        .where(~((F.col("p_val") == TM.OWL_SAMEAS) & (F.col("s_val") == F.col("o_val"))))
    )
    untouched = joined.where(~F.col("_touched")).drop("_touched")
    # Deterministic survivor columns (CLAUDE.md invariant): duplicates
    # can only arise among rows rewritten to the same canonical IRI; we
    # aggregate the carried lineage columns with min() instead of
    # keeping an arbitrary dropDuplicates survivor, so re-runs are
    # byte-identical even in graph/conv_id. (In the current emission
    # rules duplicates always share conv_id — the turn bnode is
    # conv-scoped — but min() makes that a theorem, not an accident.)
    touched = joined.where(F.col("_touched")).drop("_touched")
    if lineage:
        touched = touched.groupBy(*TM.TERM_COLS).agg(
            *[F.min(c).alias(c) for c in lineage])
    else:
        touched = touched.dropDuplicates(TM.TERM_COLS)
    return untouched.unionByName(touched)


def _dedup_canon_mentions(mentions: DataFrame,
                          rep_dim: DataFrame) -> DataFrame:
    """``distinct(conv_id, turn_idx, rep)`` with the rep IRI STRING
    replaced by its 8-byte node id DURING the shuffle — the widest
    shuffle of the whole construction moves ``(conv_id, turn_idx,
    rep_id:long)`` instead of carrying a ~50-70 B entity IRI per row,
    and the string rematerializes from a broadcast dim AFTER the
    exchange (BroadcastHashJoin — map-side, no second shuffle).

    The id is :func:`jena_spark.pipeline.encode.term_id_col` over the
    iri term — the SAME function that assigns ``o_id`` in the encoded
    store, so the collision policy is the node-dictionary policy
    (xxhash64 content ids, ``encode.assert_injective``) and the
    encoded path's dedup key and this one are the same value.
    Output is row-identical to the direct string distinct (the dim is
    a bijection), preserving the fused==generic invariant."""
    from jena_spark.pipeline.encode import term_id_col

    rep_ids = rep_dim.select("rep").distinct().withColumn(
        "rep_id", term_id_col(F.lit("iri"), F.col("rep"),
                              F.lit(None).cast("string"),
                              F.lit(None).cast("string")))
    surf_dim = rep_dim.join(F.broadcast(rep_ids), "rep") \
        .select("surface", "rep_id")
    return (
        mentions.join(F.broadcast(surf_dim), "surface")
        .select("conv_id", "turn_idx", "rep_id")
        .distinct()
        .join(F.broadcast(rep_ids), "rep_id")
        .select("conv_id", "turn_idx", "rep")
    )


def construct_canonical(
    transcripts: DataFrame, gazetteer: dict | None = None,
    mentions: DataFrame | None = None,
) -> DataFrame:
    """Fused single-pass canonical construction (deployment hot path).

    Row-identical to ``canonicalize_triples(raw_triples(transcripts))``
    (asserted at two scale factors by ``tests/test_materialize.py``) but
    shaped for throughput: every shuffle moves *pre-stringification*
    narrow rows, and every output string is materialized exactly once,
    in the final narrow emit. It rests on three theorems of the
    emission + rewrite rules:

    1. *Structure triples are never touched*: their IRIs live in
       ``NS_CONV``; equivalence components contain only ``NS_ENTITY``
       IRIs. So the bulk branch streams straight to the sink — no
       rewrite join, no dedup, scanned once.
    2. *Every emitted sameAs row dies in canonicalization*: raw sameAs
       rows are (surface_iri, canonical_iri) pairs inside one
       equivalence component, so the rewrite maps both ends to the same
       representative and the self-loop filter removes the row. The
       fused path simply never emits them.
    3. *Canonical mention edges are exactly
       distinct(conv, turn, rep(surface))*: the rewrite only changes
       the object (surface -> representative IRI); the subject bnode is
       injective in (conv_id, turn_idx). So the post-rewrite dedup of
       ~250 B string triples collapses to a dedup of 3 narrow columns
       BEFORE any IRI/bnode string is built. (The surface -> rep map
       comes from :func:`present_rep_dim` — union-find over the sameAs
       edges the PRESENT surfaces actually emit, which is exactly the
       generic data-derived closure.)

    Canonical labels are (rep(surface), rdfs:label, surface), keyed by
    the distinct-surface dimension (tiny).

    At 10^12 turns this removes: one full-width persist of the raw
    table, two full rewrite joins, and a wide post-rewrite dedup
    shuffle — leaving one narrow mention shuffle + one narrow dedup as
    the only wide operations in the whole construction.
    """
    from jena_spark.pipeline.extract import (
        _null_s,
        extract_mentions,
        turn_structure_triples,
    )

    gaz = gazetteer

    structure = turn_structure_triples(transcripts)

    if mentions is None:
        # Caller may pass an already-persisted mention frame (e.g. the
        # query registry shares one between this fused path and
        # raw_triples so the extraction UDF runs once per corpus).
        mentions = extract_mentions(transcripts, gaz).persist()
    rep_dim = present_rep_dim(mentions, gaz)
    canon_mentions = _dedup_canon_mentions(mentions, rep_dim)
    turn_bnode = TM.skolem_col(
        F.col("conv_id"), F.concat(F.lit("turn-"), F.col("turn_idx").cast("string"))
    )
    edges = canon_mentions.select(
        F.lit("bnode").alias("s_kind"), turn_bnode.alias("s_val"),
        F.lit(TM.P_MENTIONS).alias("p_val"),
        F.lit("iri").alias("o_kind"), F.col("rep").alias("o_val"),
        _null_s().alias("o_datatype"), _null_s().alias("o_lang"),
        _null_s().alias("graph"), F.col("conv_id"),
    )
    labels = (
        mentions.select("surface").distinct()
        .join(F.broadcast(rep_dim), "surface")
        .select(
            F.lit("iri").alias("s_kind"), F.col("rep").alias("s_val"),
            F.lit(TM.RDFS_LABEL).alias("p_val"),
            F.lit("literal").alias("o_kind"), F.col("surface").alias("o_val"),
            _null_s().alias("o_datatype"), _null_s().alias("o_lang"),
            _null_s().alias("graph"), _null_s().alias("conv_id"),
        )
    )
    return structure.unionByName(edges).unionByName(labels)


def construct_incremental(
    existing: DataFrame, new_transcripts: DataFrame,
    gazetteer: dict | None = None, mentions: DataFrame | None = None,
) -> DataFrame:
    """Fold a NEW batch of conversations into an existing canonical
    triple table without reconstructing it — the operation a deployed
    KG pipeline runs per arriving partition of a 10^12-turn corpus.

    Contract: ``existing`` is a :func:`construct_canonical` output (or
    this function's own output) and ``new_transcripts`` contains only
    conv_ids not present in it (append-only batches; amending a
    conversation is a DELETE + re-insert through the update ops).

    Invariant (asserted by ``tests/test_incremental.py`` on fresh
    seeds, including a forced re-election):

        ``construct_incremental(construct_canonical(A), B)``
        is row-identical to ``construct_canonical(A ∪ B)``.

    Why this is sound — three structural facts:

    1. *Components never merge.* A gazetteer component is a star
       (``gazetteer.validate_gazetteer``): every present member links
       to its hub, so all present members of a star are one component
       regardless of WHICH members are present. New surfaces only add
       nodes — so the only cross-batch effect is representative
       re-election (the elected min can change), never a merge of two
       existing components.
    2. *The KG is self-describing.* Every present surface owns exactly
       one ``(rep, rdfs:label, surface)`` row, so the prior batch's
       present-surface set AND its surface→rep election are readable
       from the label slice — no side state to carry between batches.
       (That slice is gazetteer-bounded: O(|gazetteer|) rows via a
       pushed ``p_val =`` filter, independent of corpus size.)
    3. *Re-election rewrites are collision-free.* Old reps are unique
       per component and the old→new map is per-component injective, so
       rewriting the touched slice can never create a duplicate of an
       untouched row (different components, different IRIs) nor of
       another touched row (mention edges are unique per (turn,
       component); labels per surface). No dedup shuffle at all.

    Cost shape at scale: the common batch (no re-election) is a PURE
    APPEND — the existing table is returned untouched and only the new
    batch's narrow extraction runs. A re-election batch additionally
    splits the existing table on a pushed ``isin(changed-reps)``
    predicate (parquet row-group pruning applies; with the edge table
    bucketed by object this touches only the affected buckets) and
    broadcast-rewrites the touched fraction.
    """
    from jena_spark.pipeline.extract import (
        _null_s,
        extract_mentions,
        turn_structure_triples,
    )

    spark = existing.sparkSession
    # normalize to the canonical construction schema — storage-side
    # columns (bucket, part_id lineage) are re-derived by the writer
    out_cols = list(TM.TERM_COLS) + ["graph", "conv_id"]
    existing = existing.select(out_cols)

    if mentions is None:
        mentions = extract_mentions(new_transcripts, gazetteer).persist()
    present_b = sorted(
        r["surface"] for r in mentions.select("surface").distinct().collect()
    )

    # fact 2: recover the prior election from the label slice
    label_rows = (
        existing.where((F.col("p_val") == TM.RDFS_LABEL)
                       & (F.col("o_kind") == "literal"))
        .select("s_val", "o_val").collect()
    )
    old_rep = {r["o_val"]: r["s_val"] for r in label_rows}

    present = sorted(set(old_rep) | set(present_b))
    rep_rows = present_rep_rows(present, gazetteer)
    new_rep = dict(rep_rows)

    changed = sorted({(old_rep[s], new_rep[s]) for s in old_rep
                      if old_rep[s] != new_rep[s]})
    if changed:
        old_list = [o for o, _ in changed]
        remap = F.create_map(
            *[F.lit(x) for pair in changed for x in pair])
        s_hit = (F.col("s_kind") == "iri") & F.col("s_val").isin(old_list)
        o_hit = (F.col("o_kind") == "iri") & F.col("o_val").isin(old_list)
        untouched = existing.where(~(s_hit | o_hit))
        rewritten = existing.where(s_hit | o_hit).select(
            F.col("s_kind"),
            F.when(s_hit, remap[F.col("s_val")])
            .otherwise(F.col("s_val")).alias("s_val"),
            F.col("p_val"), F.col("o_kind"),
            F.when(o_hit, remap[F.col("o_val")])
            .otherwise(F.col("o_val")).alias("o_val"),
            *[F.col(c) for c in out_cols
              if c not in ("s_kind", "s_val", "p_val", "o_kind", "o_val")],
        )
        kept = untouched.unionByName(rewritten.select(out_cols))
    else:
        kept = existing

    structure = turn_structure_triples(new_transcripts)
    rep_dim = spark.createDataFrame(rep_rows, "surface string, rep string")
    canon_mentions = _dedup_canon_mentions(mentions, rep_dim)
    turn_bnode = TM.skolem_col(
        F.col("conv_id"),
        F.concat(F.lit("turn-"), F.col("turn_idx").cast("string")),
    )
    edges = canon_mentions.select(
        F.lit("bnode").alias("s_kind"), turn_bnode.alias("s_val"),
        F.lit(TM.P_MENTIONS).alias("p_val"),
        F.lit("iri").alias("o_kind"), F.col("rep").alias("o_val"),
        _null_s().alias("o_datatype"), _null_s().alias("o_lang"),
        _null_s().alias("graph"), F.col("conv_id"),
    )
    new_surfaces = [(new_rep[s], s) for s in present_b if s not in old_rep]
    labels = spark.createDataFrame(
        new_surfaces or [], "rep string, surface string"
    ).select(
        F.lit("iri").alias("s_kind"), F.col("rep").alias("s_val"),
        F.lit(TM.RDFS_LABEL).alias("p_val"),
        F.lit("literal").alias("o_kind"), F.col("surface").alias("o_val"),
        _null_s().alias("o_datatype"), _null_s().alias("o_lang"),
        _null_s().alias("graph"), _null_s().alias("conv_id"),
    )
    return (
        kept.unionByName(structure.select(out_cols))
        .unionByName(edges.select(out_cols))
        .unionByName(labels.select(out_cols))
    )
