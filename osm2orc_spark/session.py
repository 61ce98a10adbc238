"""SparkSession factory.

UTC session timezone is non-negotiable for cell equality with the
reference's output (reference: standalone/OsmPbf2Orc.java:56 pins the JVM
default TZ to UTC before any timestamp conversion) and for the DuckDB
oracle (DuckDB timestamps are UTC-naive).

Scale posture: AQE on (runtime coalesce, skew-join splitting, dynamic
broadcast), shuffle partitions sized to the local core count for tests --
on a real cluster this is overridden to ~2-3x total cores via
``extra_conf``.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "osm2orc_spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    builder = (
        SparkSession.builder.master(master or f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.orc.filterPushdown", "true")
        # The driver's events.parquet stores TIMESTAMP(NANOS); sessions
        # built here opt into nanos-as-long up front so tables.load never
        # has to flip it mid-session (see tables.load for the fallback).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.optimizer.nestedSchemaPruning.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
