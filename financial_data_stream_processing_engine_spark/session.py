"""SparkSession factory with engine defaults.

Scale posture: AQE on (runtime re-planning, skew-join splitting,
partition coalescing), Arrow on (vectorized Python interop), UTC session
timezone (oracle parity with DuckDB's UTC-naive timestamps).  On a real
cluster the same builder is used minus ``master``; shuffle partitions
are left to AQE there.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from financial_data_stream_processing_engine_spark.config import DEFAULT_CONFIG, EngineConfig


def get_spark(
    app_name: str = "financial_data_stream_processing_engine_spark",
    config: EngineConfig = DEFAULT_CONFIG,
    master: str | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults applied."""
    builder = SparkSession.builder.appName(app_name)
    if master is None:
        master = os.environ.get("SPARK_GRAFT_MASTER")
        if master is None:
            cpus = os.environ.get("SPARK_GRAFT_CPUS")
            master = f"local[{cpus}]" if cpus else "local[*]"
    builder = (
        builder.master(master)
        # Size the local-mode JVM heap to the task slots (guide §5): the
        # 1 GiB PySpark default serves local[32]'s 32 concurrent tasks
        # plus every localCheckpoint/broadcast block through one heap —
        # measured as progressive GC-pressure inflation across a long
        # multi-query session (entries late in a bench run 1.5-2.5×
        # their solo time).  ~256 MiB/slot; env-overridable so the same
        # builder serves other machine shapes.  On a real cluster the
        # executor/driver sizing flags replace this (the setting is
        # inert once a JVM exists).
        .config(
            "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")
        )
        .config("spark.sql.shuffle.partitions", str(config.shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # The driver fixtures store events.ts as parquet TIMESTAMP(NANOS),
        # which vanilla Spark refuses (PARQUET_TYPE_ILLEGAL).  Read nanos
        # as raw int64 and convert to µs TIMESTAMP in io_utils.load_table.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    # Engine-namespace conf, visible to operators that need runtime knobs
    # (the reference exposed these via its ConfigurationManager singleton).
    spark.conf.set("engine.moving_average_window", str(config.moving_average_window))
    spark.conf.set("engine.price_alert_threshold", str(config.price_alert_threshold))
    spark.conf.set("engine.log_level", config.log_level)
    return spark
