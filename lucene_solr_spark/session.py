"""SparkSession factory with the engine's tuned defaults.

Tuned for the sandbox (single 32-core JVM) but the settings are the
ones we would ship to a 1000-executor cluster: AQE on (runtime
coalesce + skew-join splitting), Arrow on for every pandas UDF
boundary, shuffle partitions sized to cores (cluster: 2-3x total
cores), small broadcast threshold left at default so dimension
tables broadcast.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def cpu_scaled(df: DataFrame, *cols: str) -> DataFrame:
    """Repartition for a CPU-bound ``mapInPandas`` stage (signature
    building, media decode) so task count scales with BOTH the input
    and the cluster — never an absolute constant (a hardcoded
    ``repartition(8)`` funnels a 100 TB stage through 8 tasks).

    Target = max(input partitions, ``sc.defaultParallelism``): on a
    1000-executor cluster defaultParallelism is the total core count,
    and an input that is already wider than the cluster keeps its
    width. When the input is already wide enough and no balancing
    columns are requested, the frame is returned untouched (no
    shuffle at all).
    """
    sc = df.sparkSession.sparkContext
    n_in = df.rdd.getNumPartitions()
    target = max(n_in, sc.defaultParallelism)
    if cols:
        return df.repartition(target, *cols)
    if n_in >= target:
        return df
    return df.repartition(target)


def get_spark(
    app_name: str = "lucene-solr-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(cpus)
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
