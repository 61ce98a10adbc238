"""Cache-lifetime scoping for lazy query results.

Registered queries return LAZY DataFrames; the action that consumes the
plan runs in the caller (driver gate, bench, a user's job).  A frame the
returned plan reads more than once is ``persist()``-ed inside the query
function — but a ``finally: unpersist()`` there would empty the cache
before the caller's action ever runs, while an unpaired persist leaks
into the session cache for the life of the session (~8x corpus bytes per
dedup call accumulating in a long-lived session).

``release_with(result, *frames)`` ties the cached frames' lifetime to
the RESULT's Python object lifetime: a ``weakref.finalize`` fires when
the caller drops the returned DataFrame (prompt under CPython
refcounting — e.g. each bench pass reassigns ``df``, releasing the
previous pass's caches before the next starts) and unpersists every
scoped frame.  Executing the plan while the result is referenced sees
the caches; a derived frame that outlives the result simply recomputes
(correctness never depends on a cache); session shutdown drops the
blocks regardless.

Passing a NON-persisted frame is allowed and useful: ``unpersist()`` on
it is a no-op, but holding the reference until ``result`` dies defers
any release scoped to THAT frame — the composition idiom for a query
that builds on another query's result (the upstream caches stay warm
until the downstream result is dropped).
"""

from __future__ import annotations

import weakref

from pyspark.sql import DataFrame

__all__ = ["release_with"]


def release_with(result: DataFrame, *frames: DataFrame) -> DataFrame:
    """Unpersist each of ``frames`` when ``result`` is garbage-collected."""

    def _release(frames=frames):
        for fr in frames:
            try:
                fr.unpersist()
            except Exception:
                pass  # session/JVM already gone — nothing left to release

    weakref.finalize(result, _release)
    return result
