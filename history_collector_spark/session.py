"""SparkSession factory.

One shared session per process (the reference keeps one Postgres connection
for its whole lifetime, python/main.py:254-309; we keep one SparkSession).
Local-mode settings are tuned for the test harness (local[N], AQE on,
shuffle partitions sized to cores, Arrow for the pandas paths); on a real
cluster the same code runs unchanged — only master/memory change.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "history-collector-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the shared SparkSession.

    Scale posture: AQE owns runtime re-planning (partition coalescing and
    skew-join splitting), broadcast threshold stays at the default so
    dimension tables (region/nation/customer-sized sides, SURVEY §2.3
    J1/J2) go broadcast-hash automatically.
    """
    cpus = cpus or default_parallelism()
    shuffle_partitions = shuffle_partitions or cpus
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        # nanosAsLong is deliberately NOT set here: every events read that
        # needs it sets it scoped at the read site (catalog.table, the
        # streaming readers) — no hidden global state.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    # Only pin a master when launched directly (tests/bench). Under
    # spark-submit the master comes from --master/spark-defaults.conf.
    if os.environ.get("SPARK_MASTER"):
        builder = builder.master(os.environ["SPARK_MASTER"])
    elif not os.environ.get("SPARK_SUBMIT_DEPLOY_MODE"):
        builder = builder.master(f"local[{cpus}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
