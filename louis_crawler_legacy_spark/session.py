"""SparkSession factory with scale-oriented defaults.

Local testing runs on local[N]; the same config block is what we'd pass to
spark-submit on a real cluster (AQE, skew-join handling, Arrow UDF batches).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32
# Arrow batch size for pandas UDFs: large enough to amortize Python call
# overhead for the HTML/chunking UDFs, small enough to bound per-batch memory
# when html columns are wide (a 100 KB-page batch of 512 rows ≈ 50 MB —
# bigger batches drove the JVM into GCLocker retries with 32 workers).
ARROW_BATCH_SIZE = 512


def get_spark(
    app_name: str = "louis-crawler-legacy-spark",
    cpus: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``cpus``: int N → master local[N]; "*" → local[*]; None → env
    SPARK_GRAFT_CPUS or local[*].
    """
    if cpus is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = DEFAULT_SHUFFLE_PARTITIONS

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch", str(ARROW_BATCH_SIZE)
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
