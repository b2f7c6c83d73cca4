"""SparkSession factory.

Replaces the reference's per-script builder boilerplate
(``ETL_full.py:8``, ``test_method1_readALL.py:9``: ``findspark.init()`` +
``SparkSession.builder.config("spark.driver.memory","8g")``) with one
factory configured for scale-out defaults: AQE on, UTC session timezone
(so results compare bit-for-bit against UTC-naive oracles), Arrow for the
pandas-UDF path, and shuffle parallelism sized to the cluster rather than
the Spark default of 200.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_spark"]


def get_spark(
    app_name: str = "content_analytics_etl_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    Local-mode defaults come from the environment the driver runs us in
    (``SPARK_GRAFT_CPUS``); on a real cluster, pass ``master=None`` and
    let spark-submit supply master/executor settings.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.optimizer.nestedSchemaPruning.enabled", "true")
        # some testdata generations store events.ts as parquet
        # timestamp[ns], which Spark cannot read natively; with this flag
        # the reader scans ns columns as long and converts — readers.py
        # sniffs the actual unit per file and only applies the ns path
        # when the file needs it (µs files read directly)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
