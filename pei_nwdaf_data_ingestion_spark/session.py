"""SparkSession factory.

Scale design notes (the same settings express intent on a real cluster):
- AQE on: runtime partition coalescing + skew-join splitting replaces manual
  tuning when data volume jumps 100x.
- shuffle.partitions sized to cores locally; on a 1000-executor cluster this
  is the knob you raise (or let AQE coalesce from a high initial value).
- UTC session timezone: required for oracle parity and for any cross-engine
  exchange of timestamps.
- Arrow enabled: every pandas_udf / toPandas crosses the JVM<->Python boundary
  in columnar batches.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "pei-nwdaf-data-ingestion-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0) or os.cpu_count() or 4
    if shuffle_partitions is None:
        shuffle_partitions = max(4, cores)
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
