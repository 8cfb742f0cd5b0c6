"""SparkSession factory.

Local testing runs ``local[$SPARK_GRAFT_CPUS]`` (default 32) but every
config here is chosen for the 100 TB / 1000-executor target:

- AQE on (runtime coalescing, skew-join splitting) so shuffle partition
  counts self-tune as data scales.
- ``spark.sql.shuffle.partitions`` is only the pre-AQE ceiling; at cluster
  scale it should be ~2-3x total cores — parameterized for that reason.
- Arrow enabled for the few Pandas-UDF kernels (HTML parse, multimodal).
- UTC session timezone so date arithmetic is reproducible against the
  DuckDB oracle regardless of host zone.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "oic-options-chains-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
