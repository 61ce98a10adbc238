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
