"""SparkSession factory tuned for the engine.

Local mode mirrors the cluster design: AQE on (runtime skew-join handling +
partition coalescing), Arrow on (every Python crossing is vectorized),
shuffle partitions sized to cores rather than the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "ee-outliers-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = cpus
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # local mode = ONE JVM for driver+executors: size the heap for
        # cache + per-task shuffle/Arrow buffers × cores, or 32 concurrent
        # tasks GC-thrash an undersized heap and scaling inverts
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        # Xms=Xmx + pre-touch: fault the whole heap in ONCE at JVM start.
        # On this VM the page-fault path is expensive (measured: 85% sy /
        # 11% st with 32 alloc-heavy threads) — without pre-touch, heap
        # growth during the job serializes all executor threads in the
        # kernel and 32-core runs come out SLOWER than 8-core runs.
        .config(
            "spark.driver.extraJavaOptions",
            os.environ.get(
                "SPARK_DRIVER_JAVA_OPTS",
                f"-Xms{os.environ.get('SPARK_DRIVER_MEM', '48g')} "
                "-XX:+AlwaysPreTouch",
            ),
        )
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
