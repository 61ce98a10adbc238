"""Central query registry.

Every implemented operator from SURVEY.md §2 registers here as a named
query: a Spark callable ``(spark, sf_dir) -> DataFrame`` plus (when
SQL-expressible) an equivalent DuckDB oracle SQL string. The driver's
correctness gate runs both and hash-compares values, so:

- Column names must match exactly between the Spark result and the oracle.
- Result values must be bit-deterministic across engines. House rules:
  * no raw float aggregation — money/qty sums go through DECIMAL casts
    (exact, order-independent) then CAST(... AS DOUBLE);
  * float vectors are quantized via floor(x * 1e6) to BIGINT before
    dot-products (IEEE multiply + floor is engine-deterministic; BIGINT
    sums are order-independent);
  * every window/top-k has a total-order tie-break key.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None -> driver runs a weaker rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None,
    doc: str = "",
    tags: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=doc or fn.__doc__ or "", tags=tags)
        return fn

    return deco


def all_queries() -> dict[str, Query]:
    # Import side-effect modules that populate the registry.
    from osm2orc_spark.queries import relational  # noqa: F401
    from osm2orc_spark.operators import dedup, similarity, text, multimodal  # noqa: F401
    from osm2orc_spark.operators import curation, layout  # noqa: F401
    from osm2orc_spark.queries import advanced, osm_corpus, tpch_extra  # noqa: F401
    from osm2orc_spark.streaming import events  # noqa: F401

    return REGISTRY
