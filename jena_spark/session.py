"""SparkSession factory with scale-appropriate defaults.

Local mode here is a stand-in for a multi-executor cluster; every
config below is one we would set identically on a 1000-executor
deployment (AQE, skew-join splitting, Arrow for pandas UDFs, UTC
timestamps for cross-engine comparison).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "jena_spark",
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``cores`` may be an int (local[N]) or "*" (local[*]). Shuffle
    partitions default to the core count — right for local mode; on a
    real cluster AQE coalescing makes the initial number less critical.
    """
    # Make the package importable by executor-side Python workers no
    # matter where the driver was launched from. On a real cluster this
    # is `spark-submit --py-files jena_spark.zip`; in local mode the
    # workers inherit PYTHONPATH from the driver JVM's environment, so
    # export it before the JVM starts.
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pp = os.environ.get("PYTHONPATH", "")
    if pkg_root not in pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = f"{pkg_root}{os.pathsep}{pp}" if pp else pkg_root

    if cores is None:
        cores = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = f"local[{cores}]"
    if shuffle_partitions is None:
        n = (os.cpu_count() or 8) if str(cores) == "*" else int(cores)
        shuffle_partitions = max(int(n), 4)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # Byte-based coalescing under-parallelizes CPU-heavy stages (our
        # pandas-UDF extraction does much work per byte — short text
        # compresses to ~nothing in the shuffle). A small floor lets
        # parallelismFirst actually hit defaultParallelism partitions.
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Spark 4.1 UnionBase.rewriteConstraints crashes ("key not
        # found") on union-of-renamed-branches plans (our canonicalize
        # union feeding path closure). Constraint propagation only
        # powers filter inference we already write explicitly.
        .config("spark.sql.constraintPropagation.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        # zstd shuffle/spill compression: -40% shuffle bytes on the
        # construction job, -16..19% wall at BOTH measured parallelism
        # levels (BENCH/BASELINE.md zstd experiment) — on a real
        # cluster this is also 40% less shuffle network traffic
        .config("spark.io.compression.codec", "zstd")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("JENA_SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
