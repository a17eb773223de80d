"""Explicit cache lifecycle for operator-persisted DataFrames.

Dedup/ANN operators persist intermediates (LSH hash tables, normed
vector bases, edge frontiers) that are reused several times inside one
query plan. In the standalone query path that's fine — the session dies
with the process and LRU eviction covers the rest. In the DSL engine
path a long-lived session runs MANY statements, and leaving every
statement's persists to LRU means storage memory only ever grows until
eviction pressure (VERDICT r1 watch-item).

This module gives persists an owner. Operators call
:func:`track_persist` instead of ``df.persist()``; when a tracking
scope is active (the engine opens one per statement) the frame is
recorded there, and the engine unpersists the lot once the NEXT
statement begins (or on an explicit ``Engine.release()``) — by which
point the prior result has either been consumed or can be lazily
recomputed. With no active scope, ``track_persist`` degrades to a
plain ``persist()`` — query-path behavior is unchanged.

Unpersist-after-return is always semantically safe in Spark: a cached
plan that lost its cache recomputes from source. The lifecycle here is
purely a memory-footprint contract.
"""

from __future__ import annotations

import threading
from contextlib import contextmanager
from typing import Iterator, List

from pyspark.sql import DataFrame

_local = threading.local()


def track_persist(df: DataFrame) -> DataFrame:
    """``df.persist()``, registered with the active scope (if any)."""
    df = df.persist()
    scope = getattr(_local, "scope", None)
    if scope is not None:
        scope.append(df)
    return df


@contextmanager
def capture() -> Iterator[List[DataFrame]]:
    """Collect every ``track_persist`` on this thread into a list.

    The caller OWNS the returned list — frames are *not* unpersisted on
    exit (the statement's result DataFrame may still read them);
    release them later with :func:`release_all`.
    """
    prev = getattr(_local, "scope", None)
    scope: List[DataFrame] = []
    _local.scope = scope
    try:
        yield scope
    finally:
        _local.scope = prev


def scope_mark() -> int:
    """Current length of the active tracking scope (0 if none) — pair
    with :func:`adopt_since` to take ownership of frames persisted by
    a bounded stretch of operator code."""
    scope = getattr(_local, "scope", None)
    return len(scope) if scope is not None else 0


def adopt_since(mark: int) -> List[DataFrame]:
    """Remove and return every frame tracked since ``mark``.

    The caller takes ownership: the scope owner's release (the
    engine's next-statement unpersist) will no longer touch them.
    Used by long-lived artifacts (CREATE INDEX) whose caches must
    outlive the statement that built them; release them explicitly
    with :func:`release_all` when the artifact is dropped.
    """
    scope = getattr(_local, "scope", None)
    if scope is None:
        return []
    owned = list(scope[mark:])
    del scope[mark:]
    return owned


def release_all(frames: List[DataFrame]) -> None:
    """Unpersist every frame; tolerant of already-released ones."""
    for df in frames:
        try:
            df.unpersist()
        except Exception:
            pass
    frames.clear()


def release_checkpoint(df: DataFrame) -> None:
    """Free a ``localCheckpoint``'d frame's storage blocks NOW.

    ``DataFrame.unpersist()`` only clears CacheManager entries — a
    local checkpoint's RDD blocks are untouched and survive until the
    driver happens to GC the RDD reference, so a T-round iterative
    loop holds T generations of label blocks simultaneously. This
    reaches the checkpointed RDD through the analyzed ``LogicalRDD``
    and unpersists it directly (best-effort: any py4j/plan-shape
    mismatch degrades to the context-cleaner behavior).

    Only call on frames NO LONGER referenced by any live plan — a
    released checkpoint cannot recompute (the lineage was truncated);
    subsequent actions on it raise CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND.
    """
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        pass
