"""Tracked persist() for multiply-consumed operator intermediates.

Operators in this package cache intermediates that feed several plan
consumers (MinHash signatures, TF-IDF weights, gram tables, PageRank
edges).  ``persist()`` alone leaks in a long-lived driver session: each
invocation pins another frame until LRU eviction pressure.  Every
operator persist therefore goes through :func:`tracked_persist`, and a
session that invokes operators repeatedly (especially per-batch ones
like ``near_dup_filter_against``) should call :func:`release_persisted`
after materializing each result.  Storage level stays the default
MEMORY_AND_DISK, so even an unreleased session degrades to spill +
LRU eviction rather than OOM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["tracked_persist", "release_persisted", "persisted_count"]

_PERSISTED: list[DataFrame] = []


def tracked_persist(df: DataFrame) -> DataFrame:
    p = df.persist()
    _PERSISTED.append(p)
    return p


def release_persisted() -> int:
    """Unpersist every tracked frame (non-blocking); returns how many."""
    n = len(_PERSISTED)
    while _PERSISTED:
        _PERSISTED.pop().unpersist()
    return n


def persisted_count() -> int:
    return len(_PERSISTED)
