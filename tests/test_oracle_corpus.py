"""Every registered query with an oracle must hash-match DuckDB at sf0.01 —
the local twin of the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

from osm2orc_spark.registry import all_queries
from tests.oracle_harness import compare

QUERIES = all_queries()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_oracle_match(spark, sf_correctness, name):
    q = QUERIES[name]
    df = q.fn(spark, sf_correctness)
    if q.oracle is None:
        assert df.count() >= 0  # rows-only smoke for non-SQL-expressible ops
    else:
        compare(df, q.oracle, sf_correctness, name=name)
