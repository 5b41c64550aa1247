"""SparkSession factory with scale-oriented defaults.

Single place where execution knobs live so tests, bench and the driver all
run the same configuration.  AQE is on (runtime skew-join splitting +
partition coalescing), Arrow is on for the pandas-UDF geometry kernel, and
shuffle partitions default to a small-local-mode value that bench overrides
per parallelism level.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app: str = "hexscape_spark", master: str | None = None,
              shuffle_partitions: int | None = None, **extra) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER", "local[*]")
    b = (SparkSession.builder.appName(app).master(master)
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
         .config("spark.sql.adaptive.skewJoin.enabled", "true")
         .config("spark.sql.execution.arrow.pyspark.enabled", "true")
         .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
         .config("spark.sql.shuffle.partitions",
                 str(shuffle_partitions or int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))))
         .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
         .config("spark.ui.enabled", "false")
         .config("spark.sql.session.timeZone", "UTC"))
    for k, v in extra.items():
        b = b.config(k, v)
    return b.getOrCreate()
