"""SparkSession factory with the engine's scale-oriented defaults.

Local sandbox runs on local[N]; on a real cluster the same config applies —
AQE handles runtime partition coalescing and skew-join splitting, Arrow is on
for every pandas-UDF boundary, and shuffle partitions default to the session
parallelism rather than Spark's legacy 200.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "seraster_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or "local[%s]" % (
        os.environ.get("SPARK_GRAFT_CPUS", "*")
    )
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        # Let the planner pick shuffled-hash join when its size conditions
        # hold (it still falls back to sort-merge when the build side is too
        # big to hash per partition): the pointpat bucket self-joins flipped
        # SortMergeJoin -> ShuffledHashJoin and stopped paying two 10M-row
        # sorts. Size-guarded by the planner, so safe at cluster scale;
        # override via SPARK_GRAFT_PREFER_SMJ=true.
        .config(
            "spark.sql.join.preferSortMergeJoin",
            os.environ.get("SPARK_GRAFT_PREFER_SMJ", "false"),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        # Fall back from whole-stage codegen exactly when HotSpot would
        # refuse to JIT the fused method (DontCompileHugeMethods limit is
        # 8000 bytecode bytes): Spark's default of 65535 knowingly leaves
        # oversized fused stages running as INTERPRETED bytecode — measured
        # ~4x slower on the segment-supercover expression pipeline. A JVM
        # property, not a data-scale tunable, so the same value is right on
        # a cluster; override via SPARK_GRAFT_HUGE_METHOD_LIMIT.
        .config(
            "spark.sql.codegen.hugeMethodLimit",
            os.environ.get("SPARK_GRAFT_HUGE_METHOD_LIMIT", "8000"),
        )
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    if shuffle_partitions is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        shuffle_partitions = int(cpus) if cpus and cpus.isdigit() else 32
    builder = builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
