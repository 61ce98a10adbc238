"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Runs a registered query on Spark and its oracle SQL on DuckDB over the
same parquet tables, then compares: row count, column names, and exact
values (order-insensitive). Stricter than the driver on purpose — if
this passes, the driver's value-hash should too.
"""

from __future__ import annotations

import math
from datetime import datetime
from decimal import Decimal

import duckdb
import pandas as pd

from osm2orc_spark.tables import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm_cell(v):
    """Normalize a cell to a hashable, engine-independent token."""
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # repr of a double is exact (shortest round-trip) — any engine
        # difference in the underlying bits shows up here.
        return repr(v)
    if isinstance(v, Decimal):
        return f"dec:{v.normalize()}"
    if isinstance(v, pd.Timestamp) or isinstance(v, datetime):
        ts = pd.Timestamp(v)
        if ts.tzinfo is not None:
            ts = ts.tz_convert("UTC").tz_localize(None)
        return ts.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}={_norm_cell(x)}" for k, x in sorted(v.items())) + "}"
    return f"{type(v).__name__}:{v}"


def _normalize(pdf: pd.DataFrame) -> list[tuple]:
    cols = sorted(pdf.columns)
    rows = [
        tuple(_norm_cell(row[c]) for c in cols)
        for _, row in pdf[cols].iterrows()
    ]
    return sorted(rows)


def compare(spark_df, oracle_sql: str, sf_dir: str, name: str = "query") -> None:
    spdf = spark_df.toPandas()
    con = duck_connection(sf_dir)
    try:
        ddf = con.sql(oracle_sql).df()
    finally:
        con.close()

    assert sorted(spdf.columns) == sorted(ddf.columns), (
        f"{name}: column mismatch spark={sorted(spdf.columns)} duck={sorted(ddf.columns)}"
    )
    assert len(spdf) == len(ddf), f"{name}: row count spark={len(spdf)} duck={len(ddf)}"
    s_rows, d_rows = _normalize(spdf), _normalize(ddf)
    if s_rows != d_rows:
        diffs = [
            (a, b) for a, b in zip(s_rows, d_rows) if a != b
        ][:5]
        raise AssertionError(f"{name}: value mismatch; first diffs: {diffs}")
