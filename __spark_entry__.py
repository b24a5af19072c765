"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship KG-construction pipeline on
sf0.001 and returns the canonical triple table. ``queries()`` /
``oracle_sql()`` expose the full operator-parity registry
(see :mod:`jena_spark.queries.registry`): each Spark DataFrame plan is
paired with independent DuckDB SQL over the same parquet tables.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

_ROOT = os.path.dirname(os.path.abspath(__file__))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)

from pyspark.sql import DataFrame, SparkSession  # noqa: E402

from jena_spark.queries import registry as _R  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: transcripts -> extraction -> sameAs closure -> triples."""
    return _R.entry(spark)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _R.queries()


def oracle_sql() -> dict[str, str]:
    return _R.oracle_sql()
