"""ranged_two_level / the unpartitioned-window straggler (r10
scale-killer #11): customer_rfm_segments' three global NTILE sorts and
part_abc_pareto's global running-share sort run over frames that grow
LINEARLY with SF (the customer / part dimensions), each in ONE
WindowExec task.  The range-partitioned two-level spelling must be
output-identical for every tie/NULL/boundary pattern, and the exact
NTILE closed form must match F.ntile for every (n, k).
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from osm2orc_spark.operators import switches
from osm2orc_spark.operators.chunked import ranged_base, ranged_two_level
from osm2orc_spark.queries.advanced import ntile_from_rank
from osm2orc_spark.registry import all_queries

REG = all_queries()


@pytest.fixture(autouse=True)
def _clear_probe_cache():
    switches.probe_cache_clear()
    yield
    switches.probe_cache_clear()


def _rows(df):
    return sorted(
        tuple(r) for r in df.collect()
    )


# Order values from a tiny space force heavy ties (the range partitioner
# must split tie groups via the unique-id tie-break); NULL order values
# exercise consistent null ordering between repartitionByRange and the
# window; NULL sum values exercise the all-NULL-prefix stitch.
_row = st.tuples(
    st.one_of(st.none(), st.integers(min_value=0, max_value=4)),
    st.one_of(st.none(), st.integers(min_value=-5, max_value=9)),
)


@given(rows=st.lists(_row, min_size=0, max_size=40), nparts=st.sampled_from([1, 3, 7]))
@settings(max_examples=15, deadline=None)
def test_ranged_two_level_equals_flat_window(spark, rows, nparts):
    data = [(i, ordv, val) for i, (ordv, val) in enumerate(rows)]
    df = spark.createDataFrame(
        data or [(None, None, None)], "id long, ordv long, val long"
    ).filter(F.col("id").isNotNull())
    order = [F.desc("ordv"), F.asc("id")]
    flat_w = W.orderBy(*order)
    flat = df.select(
        "id",
        F.row_number().over(flat_w).alias("rk"),
        F.sum("val")
        .over(flat_w.rowsBetween(W.unboundedPreceding, 0))
        .alias("cum"),
    )
    base = ranged_base(df, order, nparts).persist()
    got = ranged_two_level(base, order, rank="rk", prefix_sum=("val", "cum"))
    try:
        assert _rows(got.select("id", "rk", "cum")) == _rows(flat)
    finally:
        base.unpersist()


@pytest.mark.parametrize("k", [1, 4, 5, 7])
def test_ntile_closed_form_matches_spark(spark, k):
    for n in list(range(0, 24)) + [97]:
        df = spark.range(1, n + 1).select(F.col("id").alias("rk"))
        want = (
            spark.range(n)
            .select(F.ntile(k).over(W.orderBy("id")).alias("b"))
            .collect()
        )
        got = df.select(ntile_from_rank("rk", n, k).alias("b")).orderBy("rk").collect()
        assert [r["b"] for r in got] == [r["b"] for r in want], (n, k)


def _forced(monkeypatch):
    monkeypatch.setattr(switches, "DIM_WINDOW_ROWS_MAX", -1)
    switches.probe_cache_clear()


def test_rfm_forced_ranged_equals_flat(spark, sf_smoke, monkeypatch):
    q = REG["customer_rfm_segments"].fn
    flat = _rows(q(spark, sf_smoke))
    assert len(flat) > 0
    _forced(monkeypatch)
    assert _rows(q(spark, sf_smoke)) == flat


def test_pareto_forced_ranged_equals_flat(spark, sf_smoke, monkeypatch):
    q = REG["part_abc_pareto"].fn
    flat = _rows(q(spark, sf_smoke))
    assert len(flat) > 0
    _forced(monkeypatch)
    assert _rows(q(spark, sf_smoke)) == flat


def test_forced_ranged_plan_has_no_unpartitioned_data_window(
    spark, sf_smoke, monkeypatch
):
    """Plan pin: with the switch forced, every window over the DATA
    frame is partitioned by _pid (the summary window over <= nparts
    rows is the only unpartitioned one left) and no ntile expression
    survives (the closed form replaced it)."""
    _forced(monkeypatch)
    plan = (
        REG["customer_rfm_segments"]
        .fn(spark, sf_smoke)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ntile" not in plan.lower()
    rn_lines = [
        line for line in plan.splitlines() if "row_number()" in line.lower()
    ]
    assert rn_lines, "expected the ranked windows in the executed plan"
    for line in rn_lines:
        assert "_pid" in line, line


# --- exact distributed percentiles (r10 scale-killer #13) -----------------

_pct_row = st.tuples(
    st.sampled_from(["a", "b", "c"]),
    st.one_of(
        st.none(),
        st.integers(min_value=-4, max_value=4).map(float),  # heavy ties
        st.floats(
            min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
        ),
    ),
)


@given(rows=st.lists(_pct_row, min_size=0, max_size=40))
@settings(max_examples=15, deadline=None)
def test_percentiles_ranged_bit_equals_flat(spark, rows):
    from osm2orc_spark.queries.advanced import (
        _percentiles_flat,
        _percentiles_ranged,
    )

    data = [(t, v, i) for i, (t, v) in enumerate(rows)]
    ev = spark.createDataFrame(
        data or [("a", None, 0)], "event_type string, value double, event_id long"
    ).filter(F.col("event_id").isNotNull() | F.lit(True))
    d = f"/synthetic/pct/{len(data)}"
    switches._PROBE_CACHE[switches._cache_key(d, "table_rows:events")] = max(
        1, len(data)
    )
    flat = sorted(tuple(r) for r in _percentiles_flat(ev).collect())
    ranged = sorted(tuple(r) for r in _percentiles_ranged(spark, d, ev).collect())
    assert flat == ranged  # bit-exact doubles, NULL groups included


def test_percentiles_forced_ranged_equals_flat(spark, sf_smoke, monkeypatch):
    q = REG["percentiles_value_by_type"].fn
    flat = _rows(q(spark, sf_smoke))
    assert len(flat) > 0
    _forced(monkeypatch)
    assert _rows(q(spark, sf_smoke)) == flat


def test_percentiles_bench_sf_stays_flat(spark):
    """Boundary pin: sf0.1's events table is EXACTLY 100,000 rows — the
    strict > on DIM_WINDOW_ROWS_MAX must keep the bench/gate plan on the
    flat aggregate (a >= would flip the headline plan and break bench
    comparability)."""
    import os

    d = "/root/testdata/sf0.1"
    if not os.path.isdir(d):
        pytest.skip("sf0.1 driver data not present")
    plan = (
        REG["percentiles_value_by_type"]
        .fn(spark, d)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "percentile(" in plan
    assert "_pid" not in plan
