"""The driver-contract must survive the driver's actual environment.

The correctness gate builds its own plain SparkSession from a CWD that is
NOT the repo root, with the repo reachable only via ``sys.path``.  Driver-
side code works anyway, but executor Python workers inherit PYTHONPATH
from the environment -- not the driver's ``sys.path`` -- so any
cloudpickled-by-reference closure (mapInPandas / applyInPandas) dies with
ModuleNotFoundError unless the package is shipped to workers.
``osm2orc_spark.session.ship_package`` (wired into ``__spark_entry__``'s
query wrapper) zips the package and registers it via ``sc.addPyFile``,
the same mechanism ``--py-files`` uses on a real cluster.

This test reproduces the driver environment in a subprocess: foreign CWD,
plain session, no PYTHONPATH, then runs the one query family that needs
Python workers (multimodal mapInPandas).
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DRIVER_SIM = """
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession

import __spark_entry__ as e

spark = (
    SparkSession.builder.master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
rows = e.queries()["multimodal_decode_meta"](spark, {sf_dir!r}).count()
print("DRIVER_SIM_ROWS", rows)
spark.stop()
"""


def test_python_udf_query_runs_from_foreign_cwd(tmp_path):
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    proc = subprocess.run(
        [sys.executable, "-c", DRIVER_SIM.format(repo=REPO, sf_dir="/root/testdata/sf0.001")],
        cwd=tmp_path,
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    marker = [l for l in proc.stdout.splitlines() if l.startswith("DRIVER_SIM_ROWS")]
    assert marker, proc.stdout[-2000:]
    assert int(marker[0].split()[1]) > 0


def test_bench_headline_names_all_registered():
    """bench.py skips unknown names silently (per-query isolation), so a
    renamed registry entry would silently drop out of the headline metric
    and the round-over-round comparison would quietly lose a query.
    Every HEADLINE name must resolve."""
    import bench

    from osm2orc_spark.registry import all_queries

    qs = all_queries()
    missing = [n for n in bench.HEADLINE if n not in qs]
    assert not missing, f"bench HEADLINE names not in registry: {missing}"
    assert len(set(bench.HEADLINE)) == len(bench.HEADLINE)  # no dupes


def test_xl_tier_names_registered():
    import bench
    from osm2orc_spark.registry import all_queries

    qs = all_queries()
    missing = [n for n in bench.XL_TIER if n not in qs]
    assert not missing, f"XL_TIER names not in registry: {missing}"
    assert len(set(bench.XL_TIER)) == len(bench.XL_TIER)


def test_xl_tier_off_without_env(monkeypatch):
    """With SPARK_GRAFT_XL_DIR unset (every driver run) the tier must be
    a no-op — the headline contract is untouched."""
    import bench

    monkeypatch.delenv("SPARK_GRAFT_XL_DIR", raising=False)
    assert bench.xl_tier_metric(None, {}) == {}
    monkeypatch.setenv("SPARK_GRAFT_XL_DIR", "/nonexistent/path")
    assert bench.xl_tier_metric(None, {}) == {}


def test_xl_tier_times_queries(spark, monkeypatch):
    """Opt-in path: point the tier at any directory holding the standard
    tables (the smoke SF here) and it times the tier queries there."""
    import bench
    from osm2orc_spark.registry import all_queries

    monkeypatch.setenv("SPARK_GRAFT_XL_DIR", "/root/testdata/sf0.001")
    monkeypatch.setattr(bench, "XL_TIER", ("dedup_exact", "tumbling_window_hourly"))
    qs = all_queries()
    out = bench.xl_tier_metric(spark, {n: qs[n] for n in bench.XL_TIER})
    assert set(out["xl_queries"]) == {"dedup_exact", "tumbling_window_hourly"}
    assert all(v > 0 for v in out["xl_queries"].values())
    assert "xl_errors" not in out
