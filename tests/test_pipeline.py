"""End-to-end pipeline vs the pure-Python reference oracle (P/R gate)."""

from __future__ import annotations

from pyspark.sql import functions as F

from jena_spark import terms as TM
from jena_spark.oracle import ref_pipeline as RP
from jena_spark.pipeline import canonicalize as CZ
from jena_spark.pipeline import extract as EX


def _spark_triple_set(df):
    return {
        (r["s_kind"], r["s_val"], r["p_val"], r["o_kind"], r["o_val"],
         r["o_datatype"], r["o_lang"])
        for r in df.select(*TM.TERM_COLS).collect()
    }


def test_raw_triples_match_oracle(spark, transcripts_df, transcripts_pdf):
    tdf, _ = transcripts_pdf
    actual = _spark_triple_set(EX.raw_triples(transcripts_df))
    expected = set(RP.graph_to_rows(RP.extract_graph(tdf)))
    p, r = RP.precision_recall(actual, expected)
    assert p == 1.0 and r == 1.0, (
        f"P={p} R={r}; only_actual={list(actual - expected)[:5]}, "
        f"only_expected={list(expected - actual)[:5]}"
    )


def test_canonical_triples_match_oracle(spark, transcripts_df, transcripts_pdf):
    tdf, _ = transcripts_pdf
    canon = CZ.canonicalize_triples(EX.raw_triples(transcripts_df))
    actual = _spark_triple_set(canon)
    expected = set(RP.graph_to_rows(RP.expected_triples(tdf)))
    p, r = RP.precision_recall(actual, expected)
    # north-star gate is >=0.95; identical rules should give exact match
    assert p >= 0.95 and r >= 0.95, f"P={p} R={r}"
    assert p == 1.0 and r == 1.0, (
        f"P={p} R={r}; only_actual={list(actual - expected)[:5]}, "
        f"only_expected={list(expected - actual)[:5]}"
    )


def test_per_turn_text_equality_invariant(spark, transcripts_df, transcripts_pdf):
    """input_hint invariant: per-turn text preserved under stable
    (conv_id, turn_idx) ordering."""
    tdf, _ = transcripts_pdf
    triples = EX.raw_triples(transcripts_df)
    texts = (
        triples.where(F.col("p_val") == TM.P_TEXT)
        .select("conv_id", "o_val")
    )
    # join back via the deterministic turn bnode to recover turn_idx
    idx = (
        triples.where(F.col("p_val") == TM.P_TURN_INDEX)
        .select(F.col("s_val").alias("turn"), F.col("o_val").cast("int").alias("turn_idx"))
    )
    t2 = (
        triples.where(F.col("p_val") == TM.P_TEXT)
        .select(F.col("s_val").alias("turn"), F.col("conv_id"), F.col("o_val").alias("text"))
        .join(idx, "turn")
        .select("conv_id", "turn_idx", "text")
    )
    got = {(r["conv_id"], r["turn_idx"]): r["text"] for r in t2.collect()}
    want = {(r.conv_id, int(r.turn_idx)): r.text for r in tdf.itertuples(index=False)}
    assert got == want
    assert texts.count() == len(want)


def test_mentions_gold_recall(spark, transcripts_df, transcripts_pdf):
    """Planted gold mentions are all recovered (extraction recall=1)."""
    _, gold = transcripts_pdf
    got = {
        (r["conv_id"], r["turn_idx"], r["surface"])
        for r in EX.extract_mentions(transcripts_df).collect()
    }
    want = {(g.conv_id, int(g.turn_idx), g.surface) for g in gold.itertuples(index=False)}
    assert want <= got
