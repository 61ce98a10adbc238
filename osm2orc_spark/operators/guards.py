"""Scale guards for quadratic verification-baseline operators.

``embedding_near_dup_pairs`` and ``dedup_ngram_jaccard`` are O(n^2)
baselines kept for oracle verification of the LSH scale paths. Nothing
in the DataFrame API stops a user pointing them at a 100 TB table, so
each one calls :func:`guard_quadratic` first: above a row threshold the
call fails fast with a pointer to the scale-safe variant unless the
caller explicitly opts in with ``allow_quadratic=True``.

The count used by the guard is parquet-metadata cheap (a count-star over
the guarded input's source table, not the joined fan-out) and runs once
per call — negligible next to the crossJoin it is guarding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# Above this many input rows the quadratic pair space (~n^2/2) exceeds
# ~200M rows — beyond what a verification baseline should ever scan.
QUADRATIC_GUARD_MAX_ROWS = 20_000


class QuadraticInputError(ValueError):
    """Raised when a quadratic baseline is called on oversized input."""


def guard_quadratic(
    df: DataFrame,
    operator: str,
    scale_path: str,
    *,
    allow_quadratic: bool = False,
    max_rows: int | None = None,
) -> None:
    """Fail fast if ``df`` is too large for an O(n^2) baseline.

    ``operator`` names the guarded function; ``scale_path`` names the
    bucketed/LSH variant the error steers the caller toward. ``max_rows``
    defaults to the module-level ``QUADRATIC_GUARD_MAX_ROWS`` resolved at
    call time (so deployments can retune it globally).
    """
    if allow_quadratic:
        return
    if max_rows is None:
        max_rows = QUADRATIC_GUARD_MAX_ROWS
    n = df.count()
    if n > max_rows:
        raise QuadraticInputError(
            f"{operator} is an O(n^2) verification baseline and its input "
            f"has {n:,} rows (guard threshold {max_rows:,}; pair space "
            f"~{n * (n - 1) // 2:,}). Use {scale_path} for production-scale "
            f"data, or pass allow_quadratic=True to override."
        )
