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

# Spark's CacheManager keys cache entries by LOGICAL PLAN, not by
# DataFrame object: two queries that persist the identical frame (e.g.
# the shared `_shingles(spark, sf_dir)` plan) hold ONE entry, and a
# plain unpersist from whichever result dies first would strip the cache
# out from under the other, still-live result (observed: a sweep holding
# query N's result across query N+1's construction ran N+1 uncached).
# Releases are therefore REFCOUNTED by the frame's semantic plan hash:
# the entry is unpersisted only when the last result scoped to that plan
# is dropped.
_PLAN_REFS: dict[int, int] = {}


def _plan_key(df: DataFrame) -> int:
    try:
        return df._jdf.queryExecution().analyzed().semanticHash()
    except Exception:  # pragma: no cover — connect/session edge
        return id(df)


def release_with(result: DataFrame, *frames: DataFrame) -> DataFrame:
    """Unpersist each of ``frames`` when ``result`` is garbage-collected
    (refcounted: a plan persisted by several live results is released
    only with the last of them)."""
    keyed = []
    for fr in frames:
        k = _plan_key(fr)
        _PLAN_REFS[k] = _PLAN_REFS.get(k, 0) + 1
        keyed.append((k, fr))

    def _release(keyed=keyed):
        for k, fr in keyed:
            left = _PLAN_REFS.get(k, 1) - 1
            if left > 0:
                _PLAN_REFS[k] = left
                continue
            _PLAN_REFS.pop(k, None)
            try:
                fr.unpersist()
            except Exception:
                pass  # session/JVM already gone — nothing left to release

    weakref.finalize(result, _release)
    return result
