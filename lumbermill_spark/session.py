"""SparkSession factory tuned for the pipeline engine.

Local-mode testing uses ``local[N]``; on a real cluster the same settings
apply (AQE, adaptive skew join, Arrow) and the master/deploy options come
from spark-submit. Nothing here is cluster-size specific: shuffle
partitioning is sized from the session's default parallelism so the same
code runs on local[8] and a 1000-executor cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "lumbermill_spark",
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or get) a SparkSession.

    cores: int N -> local[N]; "*" -> local[*]; None -> env
    SPARK_GRAFT_CPUS or local[*]. On a cluster, pass cores=None and set
    master via spark-submit instead.
    """
    if cores is None:
        cores = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = f"local[{cores}]"
    ncores = os.cpu_count() or 8
    if isinstance(cores, int) or (isinstance(cores, str) and cores.isdigit()):
        ncores = int(cores)
    if shuffle_partitions is None:
        # ~2x cores: enough tasks to rebalance, few enough to avoid
        # per-task overhead at local scale. On a big cluster AQE coalesces.
        shuffle_partitions = max(ncores * 2, 8)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(ncores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # default parallelismFirst=true never coalesces below default
        # parallelism, so KB-sized shuffles still run 2x-cores-wide —
        # at sf0.1 most doc queries were scheduler-bound on near-empty
        # tasks. False + a small advisory size packs tiny shuffles into
        # few tasks while big shuffles (sized by data) stay wide; this
        # is also the Spark-docs-recommended production setting.
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
                "false")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # Reference semantics are permissive (bad cast -> 0, not error);
        # we use try_* functions explicitly, but keep ANSI off so plain
        # casts in user filter expressions behave like Spark 3.
        .config("spark.sql.ansi.enabled", "false")
        # NB not bigger: one local JVM hosts driver+executors, and very
        # large heaps (48g+) showed erratic multi-tens-of-seconds GC
        # stalls with Arrow-heavy stages; 16g is stable (measured)
        .config("spark.driver.memory", os.environ.get("LMS_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
