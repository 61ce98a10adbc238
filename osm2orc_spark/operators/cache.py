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

Passing a NON-persisted frame is allowed and useful: holding the
reference until ``result`` dies defers any release scoped to THAT frame
— the composition idiom for a query that builds on another query's
result (the upstream caches stay warm until the downstream result is
dropped).  Note ``Dataset.unpersist`` uncaches by LOGICAL PLAN, not by
object — it is NOT a no-op if a plan-identical frame is cached elsewhere
— which is why explicit mid-query releases must go through
``safe_unpersist`` (skips plans refcounted by a live scope) rather than
calling ``df.unpersist()`` directly.
"""

from __future__ import annotations

import threading
import weakref

from pyspark.sql import DataFrame

__all__ = ["release_with", "safe_unpersist"]

# Spark's CacheManager keys cache entries by LOGICAL PLAN, not by
# DataFrame object: two queries that persist the identical frame (e.g.
# the shared `_shingles(spark, sf_dir)` plan) hold ONE entry, and a
# plain unpersist from whichever result dies first would strip the cache
# out from under the other, still-live result (observed: a sweep holding
# query N's result across query N+1's construction ran N+1 uncached).
# Releases are therefore REFCOUNTED by the frame's semantic plan hash:
# the entry is unpersisted only when the last result scoped to that plan
# is dropped.  _PLAN_REFS is mutated both from callers and from
# GC-triggered finalize callbacks (which can run on any thread), so all
# updates hold _LOCK (r6 advice).
_PLAN_REFS: dict[int, int] = {}
# REENTRANT, and held ACROSS the unpersist call in safe_unpersist (r7
# advice): releasing it between the membership check and df.unpersist()
# left a window where a concurrent release_with could register the same
# plan and still have its scoped cache stripped.  RLock (not Lock)
# because unpersist allocates and can trigger GC -> a release_with
# finalize on the SAME thread, which re-enters the lock.
_LOCK = threading.RLock()


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
    with _LOCK:
        for fr in frames:
            k = _plan_key(fr)
            _PLAN_REFS[k] = _PLAN_REFS.get(k, 0) + 1
            keyed.append((k, fr))

    def _release(keyed=keyed):
        for k, fr in keyed:
            # The unpersist stays INSIDE the lock (same rationale as
            # safe_unpersist, r7 advice): between dropping the last
            # refcount and the unpersist, a new release_with on the same
            # plan must block rather than have its cache stripped.
            with _LOCK:
                left = _PLAN_REFS.get(k, 1) - 1
                if left > 0:
                    _PLAN_REFS[k] = left
                    continue
                _PLAN_REFS.pop(k, None)
                try:
                    fr.unpersist()
                except Exception:
                    pass  # session/JVM already gone — nothing to release

    weakref.finalize(result, _release)
    return result


def safe_unpersist(df: DataFrame) -> None:
    """Eagerly unpersist a mid-query scratch frame UNLESS its logical plan
    is refcounted by a still-live ``release_with`` scope.

    PySpark's ``Dataset.unpersist`` uncaches by LOGICAL PLAN regardless of
    which object persisted it, so a bare ``df.unpersist()`` at an explicit
    release site (e.g. a fixpoint loop's per-iteration frame) can strip a
    plan-identical cache that ``release_with`` scoped to a result the
    caller still holds (r6 advice).  Perf-only either way — correctness
    never depends on a cache — but the scoping contract should not be
    bypassable from inside the package.
    """
    with _LOCK:
        if _plan_key(df) in _PLAN_REFS:
            return
        # unpersist INSIDE the lock (r7 advice): a release_with
        # registering this plan between the check and the release must
        # wait, not lose its cache.  Driver-side metadata work only —
        # holding the lock is cheap, and _LOCK is reentrant so a
        # GC-triggered finalize on this thread cannot deadlock.
        try:
            df.unpersist()
        except Exception:
            pass  # session/JVM already gone
