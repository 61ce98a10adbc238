"""Load the driver's parquet tables and register temp views.

All query callables take ``(spark, sf_dir)`` and read from
``{sf_dir}/{table}.parquet`` (TESTDATA.md). Reads are plain
``spark.read.parquet`` so Catalyst gets predicate pushdown + column
pruning into the scan for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Small dimension tables: always broadcast-joinable at any scale factor.
# region/nation are bounded by geography (25 nations, 5 regions at every SF).
BROADCAST_TABLES = {"region", "nation"}


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name in BROADCAST_TABLES:
        # Explicit hint: these stay dimension-tiny at every SF, but size
        # estimates can exceed autoBroadcastJoinThreshold on wide scans —
        # the hint pins the single-shuffle-free plan at any scale.
        return F.broadcast(spark.read.parquet(f"{sf_dir}/{name}.parquet"))
    if name == "events":
        # events.parquet stores TIMESTAMP(NANOS), which Spark's parquet
        # reader rejects. Read nanos as LONG and convert to a microsecond
        # timestamp (the generated data is µs-precision, so this is lossless
        # and matches DuckDB's TIMESTAMP_NS values instant-for-instant).
        # NOTE: this is a SESSION-LEVEL conf and deliberately not restored
        # -- the scan resolves the flag lazily at execution time, so a
        # set/restore scope would race the (lazy) plan. Sessions from
        # osm2orc_spark.session.get_spark set it at build time; for foreign
        # sessions (the driver's) this line makes nanos-as-long a sticky
        # session property from the first events read onward. A later read
        # of a genuine nanos file in the same session inherits it (raw
        # BIGINT nanos instead of an error) -- acceptable because this repo
        # treats all nanos parquet as long-typed, and documented here.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str, tables: list[str] | None = None) -> None:
    """Register temp views so corpus queries can run via ``spark.sql``."""
    for name in tables or TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
