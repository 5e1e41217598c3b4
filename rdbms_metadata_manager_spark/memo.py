"""Central registry for the per-app memo caches (ADVICE r7 #1).

Several kernels memoize an eagerly-checkpointed DataFrame (or a small
collected model such as k-means centroids / PQ codebooks) keyed by
``(sf_dir, spark.sparkContext.applicationId)``.  The contract those
caches assume is documented here once, next to the eviction hook:

**Immutable-corpus contract.**  A memo key identifies a corpus by its
*path*.  The engine assumes parquet inputs are immutable for the
lifetime of a Spark application — the normal posture for an analytics
store (new data arrives as new paths/partitions, not in-place
rewrites).  If a caller rewrites a corpus in place at the same path
within one application, it MUST call :func:`clear_memos` first, or the
memoized relations will silently serve the pre-rewrite data.

**Storage bound.**  Each memoized DataFrame is at most corpus-sized at
the working scale factor (most are far smaller: score relations, edge
lists, ≤K-row models).  ``localCheckpoint`` blocks are owned by the
RDD; dropping the cache reference makes the RDD unreachable so Spark's
ContextCleaner reclaims the blocks.  :func:`clear_memos` additionally
calls ``unpersist()`` best-effort for anything that exposes it, then
drops every reference, so a long-lived session working through many
corpora can bound executor storage explicitly.

Modules opt in by wrapping their cache dict::

    from ..memo import register_memo
    _QC_CACHE: dict = register_memo({})

and never need to change anything else — ``register_memo`` returns the
same dict it was given.
"""

from __future__ import annotations

from typing import Any

_REGISTRY: list[dict[Any, Any]] = []


def register_memo(cache: dict) -> dict:
    """Register a module-level memo dict for global eviction."""
    _REGISTRY.append(cache)
    return cache


def _unpersist(value: Any) -> None:
    # Values are DataFrames, collected python lists, or tuples mixing
    # both (e.g. bpe._TRAIN_CACHE holds (merges, DataFrame)).
    if isinstance(value, (tuple, list)):
        for v in value:
            _unpersist(v)
        return
    unp = getattr(value, "unpersist", None)
    if callable(unp):
        try:
            unp()
        except Exception:
            pass  # session already stopped — references drop below anyway


def clear_memos() -> int:
    """Evict every registered memo entry; returns the count evicted.

    Call between corpora in a long-lived session, or before re-reading
    a path that was rewritten in place (see the immutable-corpus
    contract above).
    """
    evicted = 0
    for cache in _REGISTRY:
        for value in cache.values():
            _unpersist(value)
        evicted += len(cache)
        cache.clear()
    return evicted


def registered_memo_count() -> int:
    """Number of registered memo dicts (test/introspection hook)."""
    return len(_REGISTRY)
