"""SparkSession factory tuned for both local testing and cluster scale.

AQE handles runtime re-planning (partition coalescing, skew-join
splitting); Arrow makes the few pandas-based operators batch-efficient.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "coinbase-data-pipeline-spark",
              shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession.

    Locally runs on ``local[$SPARK_GRAFT_CPUS]``; on a real cluster the
    master/conf come from spark-submit and these settings still apply.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", "32"))

    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        # testdata events.parquet stores TIMESTAMP(NANOS); Spark has no
        # nanos type, so read as long and convert in the table registry
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # x/0 → NULL (classic Spark / DuckDB semantics), not an error
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    active = SparkSession.getActiveSession()
    if active is not None:
        # can't rebuild a live session, but the runtime-settable confs
        # the engine's semantics depend on must still apply — silently
        # returning a default-config session would flip ANSI/timezone
        # behavior and the caller's shuffle sizing
        for k, v in (
            ("spark.sql.shuffle.partitions", str(shuffle_partitions)),
            ("spark.sql.adaptive.enabled", "true"),
            ("spark.sql.session.timeZone", "UTC"),
            ("spark.sql.legacy.parquet.nanosAsLong", "true"),
            ("spark.sql.ansi.enabled", "false"),
            ("spark.sql.execution.arrow.pyspark.enabled", "true"),
        ):
            try:
                active.conf.set(k, v)
            except Exception:
                pass  # static or locked conf — builder defaults apply
        return active
    return builder.master(f"local[{cpus}]").getOrCreate()
