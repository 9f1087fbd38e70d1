"""SparkSession factory tuned for this engine.

Local-mode knobs follow the sandbox contract (local[N], single JVM); on a
real cluster the same builder is used via spark-submit with master/executor
settings supplied externally, so nothing here hard-codes local-only behavior
except the defaults.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "parser_indexer_py_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``cores`` only applies when no master is configured externally; the
    bench harness passes 8 vs 32 to evidence scaling efficiency
    (BASELINE.md §2: sandbox stand-in for N vs 4N executors).
    """
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or max(
        DEFAULT_SHUFFLE_PARTITIONS, cores
    )
    # Make this package importable in executor Python workers no matter the
    # caller's cwd — the local-mode analog of `spark-submit --py-files`
    # (workers inherit the JVM's env, so set PYTHONPATH before getOrCreate).
    pkg_parent = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if pkg_parent not in os.environ.get("PYTHONPATH", "").split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            pkg_parent + os.pathsep + os.environ.get("PYTHONPATH", "")
        ).rstrip(os.pathsep)
    b = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.ui.enabled", "false")
        .config("spark.executorEnv.PYTHONPATH", os.environ["PYTHONPATH"])
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "64g"))
    )
    if "SPARK_MASTER" in os.environ:
        b = b.master(os.environ["SPARK_MASTER"])
    else:
        b = b.master(f"local[{cores}]")
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
