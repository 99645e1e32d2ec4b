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
    _mem = os.environ.get("SPARK_DRIVER_MEM", "20g")
    _pretouch = os.environ.get("SPARK_GRAFT_PRETOUCH", "1") != "0"
    _java_opts = os.environ.get(
        "SPARK_DRIVER_JAVA_OPTS",
        f"-Xms{_mem}" + (" -XX:+AlwaysPreTouch" if _pretouch else ""))
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
        # tasks GC-thrash an undersized heap and scaling inverts. 20g fits
        # every harness in this sandbox (the largest bench corpus caches
        # ~11 GB deserialized); DON'T size it "as big as the box": this
        # VM's page-fault path degrades super-linearly in faulted bytes
        # when the hypervisor is under memory pressure (measured round 6,
        # same hour: pre-touching 8g cost 7.6 s, 16g 225 s, 48g 520 s wall /
        # 192 CPU-min of sys — and while a big heap faults in, the whole
        # guest stalls). Every page the JVM never touches is startup time
        # and host co-tenancy risk saved.
        .config("spark.driver.memory", _mem)
        # Xms=Xmx + pre-touch: fault the whole heap ONCE at JVM start so
        # heap growth never serializes 32 alloc-heavy executor threads in
        # the kernel mid-job (measured: 85% sy / 11% st without it) —
        # benches keep timings fault-free this way. Harnesses with tiny
        # working sets (the pytest suite: local[4], MB-sized corpora) set
        # SPARK_GRAFT_PRETOUCH=0 instead: faulting only the ~2 GB they
        # actually use beats pre-faulting any full heap. THP
        # (-XX:+UseTransparentHugePages) was measured and REJECTED on this
        # kernel: 8g pre-touch went 7.6 s → 3m40 s / 73 CPU-min sys
        # (madvise-mode hugepage allocation storm).
        .config("spark.driver.extraJavaOptions", _java_opts)
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
