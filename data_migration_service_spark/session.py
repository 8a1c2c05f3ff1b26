"""SparkSession factory tuned for the engine.

Local-mode knobs follow the public Spark docs: shuffle partitions sized to
cores (not the 200 default), AQE on for runtime re-planning and skew-join
splitting, Arrow on for the pandas-UDF slow path, UTC session timezone so
timestamp canonicalization (reference: DBSqlGenerator.java:44,103 normalizes
to millisecond text) is reproducible everywhere.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "data_migration_service_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        try:
            n = int(master.split("[")[1].rstrip("]*")) if "[" in master else 32
        except ValueError:
            n = 32
        # 4x cores, NOT 1x: hash-aggregate tasks over wide rows anti-scale
        # with per-task map size (allocation/rehash of 100MB+ maps measured
        # 5x slower at 32 threads than 4x-smaller maps). AQE coalesces the
        # surplus away when a batch is small.
        shuffle_partitions = max(4 * n, 16)
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")
        # NOTE: an oversized, lazily-faulted local-mode heap is actively
        # harmful — with 32 concurrent tasks a 48g heap showed 3-5x wall
        # regressions (first-touch page faults + GC over the huge young gen
        # serialize across threads). Fixed 16g, pre-touched at startup, is
        # flat across 8..32 threads.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config(
            "spark.driver.extraJavaOptions",
            f"-XX:+AlwaysPreTouch -Xms{os.environ.get('SPARK_DRIVER_MEMORY', '16g')}",
        )
        .config("spark.ui.enabled", "false")
        # shuffle/spill files in RAM: the sandbox has ONE ~390MB/s disk,
        # which a real multi-executor cluster multiplies per node — keeping
        # shuffle off it measures the engine, not the single spindle
        .config("spark.local.dir",
                os.environ.get("SPARK_LOCAL_DIRS", "/dev/shm/spark-local"))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
