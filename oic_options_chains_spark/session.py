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


def cluster_conf(
    total_cores: int = 1000 * 8,
    executor_mem_gb: int = 32,
    executor_cores: int = 8,
    input_tb: float = 100.0,
) -> dict[str, str]:
    """Recommended conf for the real deployment (not used by local
    tests): sizes the shuffle/scan knobs from cluster shape instead of
    leaving Spark's single-node defaults in place.

    The arithmetic, so reviewers can check it rather than trust it:
    - shuffle partitions = 3x total cores, floored at the value where an
      even spread of the largest shuffle stage (~input size) keeps each
      partition under ~2x maxPartitionBytes. AQE coalesces the excess at
      runtime, so erring high is cheap; erring low OOMs.
    - maxPartitionBytes 256 MB: with ~4 concurrent tasks per executor
      core-group sharing executor_mem_gb, a 256 MB columnar split
      decompresses to ~1-2 GB peak — inside a 32 GB executor's working
      set with room for shuffle buffers.
    - broadcast threshold 64 MB: dimension tables (universe, calendars,
      quota/vocab tables here) are well under it; 64 MB x concurrent
      joins stays far from executor memory.
    - runtime bloom filters: when one side of a shuffle join carries a
      selective filter, the optimizer builds a bloom filter from it and
      pushes membership onto the other side's SCAN — at 100 TB that
      turns "shuffle everything, drop most of it" into "drop most of it
      at the scan". Creation threshold raised to cover fact-sized build
      sides (the default 10 MB only covers dimensions);
      ``tests/test_plans.py`` locks the injection.
    - Kryo + zstd shuffle: CPU-cheap wins that matter at petabyte
      shuffle volume, no semantic effect.
    """
    shuffle_parts = max(3 * total_cores, int(input_tb * 1024 * 1024 / 512))
    return {
        "spark.executor.cores": str(executor_cores),
        "spark.executor.memory": f"{executor_mem_gb}g",
        "spark.sql.shuffle.partitions": str(shuffle_parts),
        "spark.sql.files.maxPartitionBytes": str(256 * 1024 * 1024),
        "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "1GB",
        "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
        "spark.io.compression.codec": "zstd",
        "spark.sql.parquet.compression.codec": "zstd",
    }


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
