"""SparkSession factory with the engine's scale-oriented defaults."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "geocode-spark", master: str | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession with AQE, Arrow and skew-join enabled.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (driver contract) or
    ``local[*]``. On a real cluster these settings ship unchanged via
    ``spark-submit --py-files``.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        try:
            shuffle_partitions = max(int(master.split("[")[1].rstrip("]*") or 32), 8)
        except (IndexError, ValueError):
            shuffle_partitions = 32
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        # broadcast threshold generous: all region/centroid dims are broadcast-scale
        .config("spark.sql.autoBroadcastJoinThreshold", str(256 * 1024 * 1024))
        # local[NN] runs the whole engine (executor + caches + shuffles) in
        # the driver JVM: 16g keeps bench-scale caches (e.g. the replicated
        # lineitem block) comfortably in storage memory at larger scale
        # factors instead of spilling. Env-overridable; on a real cluster
        # the deployment sets driver/executor memory explicitly.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.extraJavaOptions", "-Djava.net.preferIPv4Stack=true")
    )
    return builder.getOrCreate()
