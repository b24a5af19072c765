from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from jena_spark import terms as TM


def test_skolem_deterministic_and_scoped():
    a = TM.skolem("conv-1", "turn-0")
    assert a == TM.skolem("conv-1", "turn-0")
    assert a.startswith("_:")
    # different scope -> different label (bnodes never merge across docs,
    # cf. LabelToNode.createScopeByDocumentHash)
    assert a != TM.skolem("conv-2", "turn-0")


def test_canonical_forms():
    assert TM.canon_integer("01") == "1"
    assert TM.canon_integer("+5") == "5"
    assert TM.canon_boolean("TRUE") == "true"
    assert TM.canon_datetime(datetime(2026, 1, 1, 12, 0, 5)) == "2026-01-01T12:00:05Z"


def test_entity_iri():
    assert TM.entity_iri("New York City") == TM.NS_ENTITY + "new_york_city"
    assert TM.entity_iri("A. Turing") == TM.NS_ENTITY + "a_turing"


def test_column_twins_match_python(spark):
    rows = [("conv-7", 3, "A. Turing", datetime(2026, 2, 1, 8, 30, 0))]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, name string, ts timestamp")
    out = df.select(
        TM.skolem_col(F.col("conv_id"), F.concat(F.lit("turn-"), F.col("turn_idx"))).alias("sk"),
        TM.entity_iri_col(F.col("name")).alias("ei"),
        TM.canon_integer_col(F.col("turn_idx")).alias("ci"),
        TM.canon_datetime_col(F.col("ts")).alias("cd"),
        TM.conv_iri_col(F.col("conv_id")).alias("cv"),
    ).collect()[0]
    assert out["sk"] == TM.skolem("conv-7", "turn-3")
    assert out["ei"] == TM.entity_iri("A. Turing")
    assert out["ci"] == TM.canon_integer("3")
    assert out["cd"] == TM.canon_datetime(datetime(2026, 2, 1, 8, 30, 0))
    assert out["cv"] == TM.conv_iri("conv-7")


def test_validate_gazetteer_contracts():
    import pytest as _pytest

    from jena_spark.gazetteer import DEFAULT_GAZETTEER, validate_gazetteer

    # the shipped gazetteer satisfies both contracts
    s2c = validate_gazetteer(DEFAULT_GAZETTEER)
    assert s2c["NYC"] == "New York"

    # slug collision (NYC vs nyc) fails loudly
    with _pytest.raises(ValueError, match="slug collision"):
        validate_gazetteer({"New York": ["NYC", "nyc"]})

    # chained alias (canonical that is itself an alias) fails loudly
    with _pytest.raises(ValueError, match="star"):
        validate_gazetteer({"A": ["B"], "B": ["C"]})

    # one alias claimed by two canonicals fails loudly
    with _pytest.raises(ValueError, match="star"):
        validate_gazetteer({"A": ["X"], "B": ["X"]})
