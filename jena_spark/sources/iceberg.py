"""Iceberg table source/sink — the deployment-target storage layer.

The north rule names Iceberg-backed transcript tables; this sandbox
image has no Iceberg runtime jars, so everything here degrades to the
parquet layout `pipeline/materialize.py` writes (which is shaped like
an Iceberg bucket-partitioned table on purpose: `part_id =
pmod(xxhash64(conv_id), n)` ≙ a `bucket(n, conv_id)` partition
transform). On a real cluster, set the catalog configs below and the
same code paths run against Iceberg with ACID appends, snapshot
time-travel for resume, and metadata-level file pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

ICEBERG_CONFS = {
    # documented deployment configs (need iceberg-spark-runtime on the CP)
    "spark.sql.extensions":
        "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
    "spark.sql.catalog.kg": "org.apache.iceberg.spark.SparkCatalog",
    "spark.sql.catalog.kg.type": "hadoop",
}


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:  # noqa: BLE001
        return False


def read_table(spark: SparkSession, identifier: str) -> DataFrame:
    """``kg.db.table`` via the Iceberg catalog when present, else a
    parquet directory path."""
    if iceberg_available(spark) and not identifier.startswith("/"):
        return spark.read.format("iceberg").load(identifier)
    return spark.read.parquet(identifier)


def append_table(df: DataFrame, identifier: str) -> None:
    if iceberg_available(df.sparkSession) and not identifier.startswith("/"):
        df.writeTo(identifier).append()
        return
    df.write.mode("append").parquet(identifier)
