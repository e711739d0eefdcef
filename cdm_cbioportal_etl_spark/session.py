"""SparkSession factory tuned for this engine.

Defaults target local[N] testing but every knob is the one you'd set on a
1000-executor cluster: AQE (runtime re-plan + skew-join splitting),
Arrow-batched Python exchange, shuffle-partition sizing, and small
broadcast-join thresholds left to Catalyst.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Tuned for ~128 GiB / 32-core local mode; on a real cluster these come from
# spark-submit conf.  shuffle.partitions is intentionally modest locally —
# AQE coalesces further — while at 100 TB you'd size it to
# (input bytes / ~128 MB target partition).
_DEFAULTS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.shuffle.partitions": "32",
    "spark.sql.files.maxPartitionBytes": "134217728",
    "spark.sql.parquet.compression.codec": "snappy",
    "spark.sql.session.timeZone": "UTC",
    # pipelined replay submits prepare(k+1) and apply(k) from two driver
    # threads; FAIR keeps the overlapped jobs from starving each other
    "spark.scheduler.mode": "FAIR",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
    # throughput GC: G1's concurrent barriers collapse under 32 allocation-
    # heavy task threads in one JVM (measured 2-3x slower than ParallelGC on
    # a codegen sha2 scan); batch analytics wants max throughput, not pause
    # targets
    # 512m code cache: the default 240m fills after ~30 distinct
    # whole-stage-codegen'd query plans in one JVM, HotSpot stops
    # JIT-compiling, and late queries run interpreted (measured 3-6x
    # inflation on the full bench sweep in one session)
    "spark.driver.extraJavaOptions": "-XX:+UseParallelGC -XX:ReservedCodeCacheSize=512m",
    "spark.executor.extraJavaOptions": "-XX:+UseParallelGC -XX:ReservedCodeCacheSize=512m",
    "spark.ui.enabled": "false",
    "spark.sql.autoBroadcastJoinThreshold": "33554432",  # 32 MB
}


def get_spark(
    app_name: str = "cdm-cbioportal-etl-spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or ``local[*]``)
    so the same code path serves tests, bench at two parallelism levels,
    and (via spark-submit, where master is pre-set) cluster runs.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None and not os.environ.get("SPARK_MASTER"):
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if master:
        builder = builder.master(master)
    conf = dict(_DEFAULTS)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
