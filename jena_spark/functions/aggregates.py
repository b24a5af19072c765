"""Custom aggregate surface (§2.15) — ARQ AggregateRegistry parity.

Reference: custom aggregates register by IRI
(``jena-arq/.../sparql/expr/aggregate/AggregateRegistry.java:31-47``,
``AggCustom.java``) and plug into GROUP BY evaluation. Spark analog:
Arrow-batched ``pandas_udf`` GROUPED_AGG functions registered in a
dict-by-name registry; built-ins below mirror ARQ's statistical
extensions style (``AggMedian.java:34`` etc.).
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

# NOTE: return types are DataType instances, not DDL strings — string
# parsing requires an active SparkSession at import time (session.py
# gotcha); instances keep this module importable anywhere.


@F.pandas_udf(DoubleType())
def geometric_mean(v: pd.Series) -> float:
    """exp(mean(ln x)) over positive values — a GROUPED_AGG pandas UDF
    (one Arrow batch per group partition, vectorized numpy inside)."""
    x = v[v > 0]
    if len(x) == 0:
        return float("nan")
    return float(np.exp(np.log(x.astype("float64")).mean()))


@F.pandas_udf(DoubleType())
def harmonic_mean(v: pd.Series) -> float:
    x = v[v != 0]
    if len(x) == 0:
        return float("nan")
    return float(len(x) / (1.0 / x.astype("float64")).sum())


AGGREGATE_REGISTRY: dict[str, Callable] = {
    "geometric_mean": geometric_mean,
    "harmonic_mean": harmonic_mean,
}


def register(name: str, fn: Callable) -> None:
    """AggregateRegistry.register analog."""
    AGGREGATE_REGISTRY[name] = fn
