"""Fit-once / probe-many ANN index surface (r8 verdict #4).

The registered fused queries (``ann_ivf_kmeans``, ``ann_ivfpq_probe``)
re-fit their centroids/codebooks on every call — correct for a
self-contained oracle-checked query, but it prices the wrong thing at
scale: a production 100 TB deployment fits ONCE on a bounded sample
(``MAX_FIT_ROWS`` caps the collect at any corpus size) and probes many
times.  The r8 XL record charged 12-24 s of per-call fitting to probes
whose actual scan cost is seconds.

This module splits the pipeline at the natural seam:

- :func:`ann_build_index` runs the bounded deterministic fits and
  returns an :class:`AnnIndex` — a tiny, driver-resident value object
  (k x d coarse centroids, plus m x k x d PQ codebooks for ``ivfpq``).
- :func:`index_to_df` / :func:`index_from_df` round-trip the index
  through a DataFrame, so it persists as a SMALL TABLE (k + m*k rows —
  8 + 128 at the registered config) next to the corpus: write it with
  ``df.write.parquet`` once, read + rebuild per probe session.
- :func:`ann_ivf_probe_prebuilt` / :func:`ann_ivfpq_probe_prebuilt`
  run the SAME probe cores the fused queries run (``_ivf_topk`` /
  ``_ivfpq_topk`` — shared helpers, so split == fused is structural,
  and test-asserted end-to-end in tests/test_switches.py).

Scale shape: the index is plan-literal-sized (centroids bake into the
probe scan as literals — no join, no shuffle before the TakeOrdered),
so probe-with-prebuilt-index is one narrow scan stage at any corpus
size; the XL record (``ann_prebuilt`` lines in SCALING_SKEW.jsonl)
prices it separately from the fit.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class AnnIndex:
    kind: str  # "ivf" | "ivfpq"
    centroids: tuple[tuple[int, ...], ...]  # k x d coarse centroids
    books: tuple[tuple[tuple[int, ...], ...], ...] | None = None  # m x k x d


def ann_build_index(spark: SparkSession, sf_dir: str, kind: str = "ivf") -> AnnIndex:
    """Run the bounded deterministic fits once: integer Lloyd's coarse
    centroids (+ per-subspace PQ codebooks for ``ivfpq``).  Driver
    memory is capped by MAX_FIT_ROWS regardless of corpus size."""
    from osm2orc_spark.operators.similarity import (
        IVF_KM_ITERS,
        N_CENTROIDS,
        _lloyd_fit_ints,
        _pq_lloyd_fit,
    )

    if kind not in ("ivf", "ivfpq"):
        raise ValueError(f"unknown index kind: {kind}")
    cents = _lloyd_fit_ints(spark, sf_dir, N_CENTROIDS, IVF_KM_ITERS)
    books = None
    if kind == "ivfpq":
        books = tuple(
            tuple(tuple(int(v) for v in code) for code in book)
            for book in _pq_lloyd_fit(spark, sf_dir, IVF_KM_ITERS)
        )
    return AnnIndex(
        kind=kind,
        centroids=tuple(tuple(int(v) for v in c) for c in cents),
        books=books,
    )


def index_to_df(spark: SparkSession, index: AnnIndex) -> DataFrame:
    """The index as a small table: one row per coarse centroid
    (component='ivf', m=-1) and per PQ codeword (component='pq', m=
    subspace).  k + m*k rows total — trivially persistable as parquet
    next to the corpus."""
    rows = [
        ("ivf", index.kind, -1, cid, list(c))
        for cid, c in enumerate(index.centroids)
    ]
    if index.books is not None:
        rows += [
            ("pq", index.kind, m, cid, list(code))
            for m, book in enumerate(index.books)
            for cid, code in enumerate(book)
        ]
    return spark.createDataFrame(
        rows, "component string, kind string, m int, cid int, vec array<bigint>"
    )


def index_from_df(df: DataFrame) -> AnnIndex:
    """Rebuild the driver-side index from its table form (bounded
    collect: k + m*k rows)."""
    rows = df.collect()
    kind = rows[0]["kind"]
    cents = sorted(
        ((r["cid"], tuple(int(v) for v in r["vec"])) for r in rows if r["component"] == "ivf")
    )
    pq = [(r["m"], r["cid"], tuple(int(v) for v in r["vec"])) for r in rows if r["component"] == "pq"]
    books = None
    if pq:
        n_m = max(m for m, _, _ in pq) + 1
        books = tuple(
            tuple(code for _, cid, code in sorted((x for x in pq if x[0] == m), key=lambda x: x[1]))
            for m in range(n_m)
        )
    return AnnIndex(kind=kind, centroids=tuple(c for _, c in cents), books=books)


def ann_ivf_probe_prebuilt(
    spark: SparkSession, sf_dir: str, index: AnnIndex
) -> DataFrame:
    """Probe the corpus with a prebuilt IVF index — identical output to
    the fused ``ann_ivf_kmeans`` (same ``_ivf_topk`` core) with zero fit
    cost in the probe path."""
    from osm2orc_spark.operators.similarity import _ivf_topk

    return _ivf_topk(spark, sf_dir, [list(c) for c in index.centroids])


def ann_ivfpq_probe_prebuilt(
    spark: SparkSession,
    sf_dir: str,
    index: AnnIndex,
    nprobe: int | None = None,
    shortlist: int | None = None,
) -> DataFrame:
    """Probe with a prebuilt IVF-PQ index — identical output to the
    fused ``ann_ivfpq_probe`` (same ``_ivfpq_topk`` core)."""
    from osm2orc_spark.operators.similarity import (
        N_PROBE,
        PQ_SHORTLIST,
        _ivfpq_topk,
    )

    if index.books is None:
        raise ValueError("ivfpq probe needs an index built with kind='ivfpq'")
    return _ivfpq_topk(
        spark,
        sf_dir,
        [list(c) for c in index.centroids],
        [[list(code) for code in book] for book in index.books],
        nprobe or N_PROBE,
        shortlist or PQ_SHORTLIST,
    )


# ---------------------------------------------------------------------------
# Registered prebuilt-probe queries (r9 verdict #3): the driver has only
# ever hash-checked the FUSED fit+probe queries, but the XL record
# (``ann_prebuilt_xl``: probe 0.85-0.93 s vs 12-24 s fused) shows
# fit-once/probe-many is the cost model a 100 TB deployment actually
# pays.  These registrations put that surface under the oracle gate.
#
# The index memoizes per (sf_dir, kind) — the same probe-once/run-many
# posture as operators/switches.py, and the production semantics this
# surface exists to price: the FIRST call in a process pays the bounded
# fit (plus the index_to_df/index_from_df round-trip, so the small-table
# persistence path is exercised under the gate too), subsequent calls
# are probe-only.  The fits are deterministic (integer Lloyd's,
# md5-ranked seeds), so the oracle is EXACTLY the fused query's oracle —
# same centroids, same codebooks, same shared probe core.
# ---------------------------------------------------------------------------
_INDEX_CACHE: dict[tuple[str, str], AnnIndex] = {}


def index_cache_clear() -> None:
    """Drop memoized indexes (tests that rewrite a dir in place)."""
    _INDEX_CACHE.clear()


def cached_index(spark: SparkSession, sf_dir: str, kind: str) -> AnnIndex:
    """Build-once-per-process index for ``sf_dir``: fit, round-trip
    through the small-table form (schema + rebuild exercised on the
    gate path), memoize."""
    import os

    key = (os.path.abspath(sf_dir), kind)
    if key not in _INDEX_CACHE:
        built = ann_build_index(spark, sf_dir, kind=kind)
        _INDEX_CACHE[key] = index_from_df(index_to_df(spark, built))
    return _INDEX_CACHE[key]


def _register_prebuilt_queries() -> None:
    from osm2orc_spark.operators import similarity  # noqa: F401 — fused oracles
    from osm2orc_spark.registry import REGISTRY, register

    register(
        "ann_ivf_probe_prebuilt",
        oracle=REGISTRY["ann_ivf_kmeans"].oracle,
        doc="Fit-once/probe-many IVF retrieval — the production-priced "
        "path: the coarse index is built ONCE per corpus (bounded "
        "deterministic Lloyd's fit, MAX_FIT_ROWS cap), round-tripped "
        "through its k-row table form, memoized, and every call probes "
        "via the shared _ivf_topk core (centroids baked into the scan "
        "as literals — join-free and exchange-free before TakeOrdered). "
        "Output — and oracle — identical to the fused ann_ivf_kmeans "
        "because the fit is deterministic; what changes is the COST "
        "MODEL: XL record 0.85 s/probe vs 12.2 s fused at 800k vectors "
        "(ann_prebuilt_xl in SCALING_SKEW.jsonl).",
        tags=("similarity",),
    )(lambda spark, sf_dir: ann_ivf_probe_prebuilt(
        spark, sf_dir, cached_index(spark, sf_dir, "ivf")
    ))

    register(
        "ann_ivfpq_probe_prebuilt",
        oracle=REGISTRY["ann_ivfpq_probe"].oracle,
        doc="Fit-once/probe-many IVF-PQ retrieval: coarse centroids + "
        "8 PQ codebooks built once (136-row table form), probes via the "
        "shared _ivfpq_topk core (cluster pruning + ADC LUT + exact "
        "re-rank in one vectorized scan stage). Output/oracle identical "
        "to the fused ann_ivfpq_probe; the XL record prices the probe "
        "at 0.93 s vs 24.3 s fused (r8) / 9.1 s fused-vectorized (r9).",
        tags=("similarity",),
    )(lambda spark, sf_dir: ann_ivfpq_probe_prebuilt(
        spark, sf_dir, cached_index(spark, sf_dir, "ivfpq")
    ))


_register_prebuilt_queries()
