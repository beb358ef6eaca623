"""Scoped ownership for operator-internal caches.

Several operators persist slim intermediate frames (band/bucket triples,
vector norms, normalized ER inputs) because BOTH sides of a self-join
re-execute the whole subtree otherwise — aliased self-joins do not reuse
exchanges (measured round 5: minhash 2.8→1.5 s at sf0.1). Those frames
must outlive the operator function (the returned DataFrame is lazy), so
the operator cannot simply ``unpersist()`` before returning; round 5
shipped them as session-lifetime leaks.

This module makes the ownership explicit, two ways:

- :func:`scoped_persist` — what operators call instead of
  ``df.persist()``. With no scope active, the frame lands in a BOUNDED
  session registry (FIFO, ``MAX_SESSION_FRAMES``): a long-lived session
  invoking operators repeatedly evicts (unpersists) the oldest frames
  instead of accumulating until ContextCleaner GC. Eviction is always
  safe — an unpersisted frame recomputes, it never changes values.

- :func:`cache_scope` — deterministic release for callers who want ZERO
  residue: every frame registered inside the scope is unpersisted at
  exit, and any RDD newly pinned during the scope (e.g. the eager
  ``localCheckpoint`` some operators use to pin a small result while
  freeing its big inputs) is swept by id-diff against the scope entry
  snapshot. Consume the result INSIDE the scope::

      with cache_scope(spark):
          pairs = minhash_lsh_pairs(docs, "doc_id", "text")
          pairs.write.parquet(out)      # materialize before exit

  After exit the block manager holds nothing the scope created
  (tests/test_cache_scope.py pins this for three gate paths). The
  id-diff sweep assumes the usual single-driver-thread usage; concurrent
  jobs on the same session should rely on the bounded registry instead.
"""

from __future__ import annotations

from collections import deque
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession

#: Upper bound on operator-internal frames cached OUTSIDE any scope.
#: Big enough that no single query path (a suite runs ~20 parts, each
#: registering 0-3 slim frames) ever evicts its own still-needed frame
#: mid-plan; small enough that a long-lived session is bounded.
MAX_SESSION_FRAMES = 64

_SCOPES: list[list[DataFrame]] = []
_SESSION: deque[DataFrame] = deque()


def _safe_unpersist(df: DataFrame) -> None:
    try:
        df.unpersist()
    except Exception:
        # session already stopped — nothing left to free
        pass


def scoped_persist(df: DataFrame) -> DataFrame:
    """``df.persist()`` with ownership: registered to the innermost
    :func:`cache_scope` if one is active, else to the bounded session
    registry (FIFO eviction past ``MAX_SESSION_FRAMES``)."""
    df = df.persist()
    if _SCOPES:
        _SCOPES[-1].append(df)
    else:
        _SESSION.append(df)
        while len(_SESSION) > MAX_SESSION_FRAMES:
            _safe_unpersist(_SESSION.popleft())
    return df


def release_session_caches() -> int:
    """Unpersist every session-registry frame now (bench/driver sweep
    hook). Returns the number released."""
    n = len(_SESSION)
    while _SESSION:
        _safe_unpersist(_SESSION.popleft())
    return n


@contextmanager
def cache_scope(spark: SparkSession | None = None):
    """Deterministic cache ownership: frames registered via
    :func:`scoped_persist` inside the block are unpersisted at exit;
    with ``spark`` given, RDDs newly pinned during the block (eager
    localCheckpoints included) are swept too."""
    before: set[int] = set()
    jsc = None
    if spark is not None:
        jsc = spark.sparkContext._jsc
        before = {e for e in jsc.getPersistentRDDs().keySet().toArray()}
    frames: list[DataFrame] = []
    _SCOPES.append(frames)
    try:
        yield
    finally:
        _SCOPES.pop()
        for df in frames:
            _safe_unpersist(df)
        if jsc is not None:
            try:
                for rid, rdd in dict(jsc.getPersistentRDDs()).items():
                    if rid not in before:
                        rdd.unpersist()
            except Exception:
                pass
