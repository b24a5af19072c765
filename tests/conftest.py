from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from jena_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("jena_spark_tests", cores=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def transcripts_pdf():
    from tests.fixtures import gen_transcripts

    tdf, gdf = gen_transcripts(n_convs=40, seed=42)
    return tdf, gdf


@pytest.fixture(scope="session")
def transcripts_df(spark, transcripts_pdf):
    from jena_spark.schemas import TRANSCRIPTS_SCHEMA

    tdf, _ = transcripts_pdf
    return spark.createDataFrame(tdf, TRANSCRIPTS_SCHEMA)
