"""Invariant: every persist() is paired with a release.

The r5 review found five shingle ``persist()`` sites leaking into the
session cache after the query returned (~8x corpus bytes per operator in
a long-lived session).  The house rule, enforced here over EVERY module
in the package (test_constant_parity style — a static sweep no new code
can silently dodge):

  a variable assigned from ``....persist()`` inside a function must, in
  that same function, either be ``.unpersist()``-ed (the materialize →
  ``finally`` pattern for eagerly-executed frames) or be passed to
  ``release_with(...)`` (cache lifetime scoped to the returned lazy
  result's object lifetime — see ``operators/cache.py``).

Plus a runtime check: running a cache-scoped query end-to-end and then
dropping the result leaves ZERO persistent RDDs in the session.
"""

from __future__ import annotations

import ast
import gc
import pathlib

import pytest

PKG = pathlib.Path(__file__).resolve().parent.parent / "osm2orc_spark"


def _persist_targets(fn: ast.FunctionDef) -> set[str]:
    """Names assigned from a call chain ending in .persist()."""
    out: set[str] = set()
    for node in ast.walk(fn):
        if not isinstance(node, ast.Assign):
            continue
        v = node.value
        if (
            isinstance(v, ast.Call)
            and isinstance(v.func, ast.Attribute)
            and v.func.attr == "persist"
        ):
            for tgt in node.targets:
                if isinstance(tgt, ast.Name):
                    out.add(tgt.id)
    return out


def _released_names(fn: ast.FunctionDef) -> set[str]:
    """Names that are unpersist()ed or passed to release_with() in fn."""
    out: set[str] = set()
    for node in ast.walk(fn):
        if not isinstance(node, ast.Call):
            continue
        f = node.func
        if isinstance(f, ast.Attribute) and f.attr == "unpersist":
            if isinstance(f.value, ast.Name):
                out.add(f.value.id)
        if isinstance(f, ast.Name) and f.id == "safe_unpersist":
            # r7: explicit releases route through the refcount-aware
            # safe_unpersist(frame) instead of frame.unpersist()
            for arg in node.args:
                if isinstance(arg, ast.Name):
                    out.add(arg.id)
        if isinstance(f, ast.Name) and f.id == "release_with":
            for arg in node.args[1:]:
                if isinstance(arg, ast.Name):
                    out.add(arg.id)
    return out


def test_every_persist_site_has_a_paired_release():
    offenders: list[str] = []
    for path in sorted(PKG.rglob("*.py")):
        tree = ast.parse(path.read_text())
        for fn in ast.walk(tree):
            if not isinstance(fn, ast.FunctionDef):
                continue
            unreleased = _persist_targets(fn) - _released_names(fn)
            for name in sorted(unreleased):
                offenders.append(f"{path.relative_to(PKG.parent)}:{fn.name}:{name}")
    assert not offenders, (
        "persist() without a paired unpersist()/release_with() — the cache "
        f"leaks into the session after the query returns: {offenders}"
    )


@pytest.mark.parametrize(
    "qname",
    ["dedup_ppjoin", "dedup_minhash_lsh_dfcap", "simhash_near_dup"],
)
def test_scoped_caches_release_on_result_drop(spark, sf_correctness, qname):
    from osm2orc_spark.registry import all_queries

    spark.catalog.clearCache()
    df = all_queries()[qname].fn(spark, sf_correctness)
    df.count()  # materialize: the scoped persists are now live blocks
    assert spark.sparkContext._jsc.getPersistentRDDs().size() > 0
    del df
    gc.collect()
    assert spark.sparkContext._jsc.getPersistentRDDs().size() == 0, (
        f"{qname}: dropping the result did not release its scoped caches"
    )


def test_refcounted_shared_plan_cache_survives_first_drop(spark, sf_correctness):
    """The sweep pattern release_with's refcount exists for (r6 verdict
    #6): two live results scope the SAME cached ``_shingles`` plan
    (Spark's CacheManager keys by logical plan, so they share one
    entry).  Dropping the first result must NOT strip the shared cache
    out from under the second; dropping both must leave zero persistent
    RDDs."""
    from osm2orc_spark.registry import all_queries

    qs = all_queries()
    spark.catalog.clearCache()
    a = qs["dedup_ppjoin"].fn(spark, sf_correctness)
    a.count()
    b = qs["dedup_containment_ppjoin"].fn(spark, sf_correctness)
    b.count()
    n_both = spark.sparkContext._jsc.getPersistentRDDs().size()
    assert n_both > 0
    del a
    gc.collect()
    n_after_a = spark.sparkContext._jsc.getPersistentRDDs().size()
    # a's private prefix cache may go, but the shared shingle plan
    # (refcount 2 -> 1) must survive for b
    assert 1 <= n_after_a <= n_both, (
        "dropping the first result stripped the shared shingle cache "
        "scoped to the still-live second result"
    )
    del b
    gc.collect()
    assert spark.sparkContext._jsc.getPersistentRDDs().size() == 0


def test_safe_unpersist_skips_refcounted_plan(spark, sf_correctness):
    """Dataset.unpersist uncaches by logical plan regardless of which
    object persisted it — safe_unpersist must therefore SKIP a frame
    whose plan is refcounted by a live release_with scope (r6 advice),
    and release normally once no scope holds it."""
    from pyspark.sql import functions as F

    from osm2orc_spark.operators.cache import release_with, safe_unpersist
    from osm2orc_spark.tables import load

    spark.catalog.clearCache()
    cached = load(spark, sf_correctness, "documents").select("doc_id").persist()
    cached.count()
    result = release_with(cached.agg(F.count(F.lit(1))), cached)
    assert spark.sparkContext._jsc.getPersistentRDDs().size() >= 1
    # plan-identical twin built independently: a bare twin.unpersist()
    # would strip the cache scoped to `result`; safe_unpersist skips it
    twin = load(spark, sf_correctness, "documents").select("doc_id")
    safe_unpersist(twin)
    assert spark.sparkContext._jsc.getPersistentRDDs().size() >= 1, (
        "safe_unpersist stripped a plan refcounted by a live scope"
    )
    del result
    gc.collect()
    assert spark.sparkContext._jsc.getPersistentRDDs().size() == 0
    # once nothing holds the plan, safe_unpersist releases eagerly
    again = load(spark, sf_correctness, "documents").select("doc_id").persist()
    again.count()
    assert spark.sparkContext._jsc.getPersistentRDDs().size() >= 1
    safe_unpersist(again)
    assert spark.sparkContext._jsc.getPersistentRDDs().size() == 0


def test_training_mix_unpersists_on_construction_failure(
    spark, sf_correctness, monkeypatch
):
    """r15 (ADVICE): if plan construction raises after the quality frame
    is persisted (e.g. canonical docs fails mid-build), the except path
    must unpersist it — otherwise the cache (and the warm count job's
    blocks) leaks for the rest of the session."""
    from osm2orc_spark.operators import curation

    spark.catalog.clearCache()

    def boom(*a, **k):
        raise RuntimeError("canonical boom")

    monkeypatch.setattr(curation, "curation_canonical_docs", boom)
    with pytest.raises(RuntimeError, match="canonical boom"):
        curation.curation_training_mix(spark, sf_correctness)
    gc.collect()
    assert spark.sparkContext._jsc.getPersistentRDDs().size() == 0, (
        "construction failure leaked the persisted quality frame"
    )
