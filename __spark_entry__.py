"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (Q1 pricing summary) at sf0.001.
``queries()`` / ``oracle_sql()`` expose every registered operator from
SURVEY.md §2 (see osm2orc_spark/registry.py for the determinism rules
that make the Spark and DuckDB results hash-identical).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from osm2orc_spark.registry import all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    qs = all_queries()
    return qs["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            # Gate-throughput posture for a plain driver session at small
            # SF: 16 shuffle partitions instead of the 200 default (AQE
            # still coalesces below that) and Arrow collection. Results
            # are partitioning-independent by the registry determinism
            # rules, so these are purely speed knobs.
            spark.conf.set("spark.sql.shuffle.partitions", "16")
            spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
            # The driver builds its own plain session, possibly from a
            # foreign CWD with the repo reachable only via sys.path --
            # ship the package so Python-UDF tasks can import it.
            from osm2orc_spark.session import ship_package

            ship_package(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(q.fn) for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted for non-SQL-expressible ops."""
    return {name: q.oracle for name, q in all_queries().items() if q.oracle is not None}
