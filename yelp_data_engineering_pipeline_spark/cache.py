"""Tracked persist/unpersist (ADVICE.md r1: persist() calls in dedup/ids
were never paired with unpersist, so repeated catalog/bench invocations
accumulate cached blocks until eviction pressure).

A persisted subtree whose partitioning feeds later stages (e.g. the
range-repartitioned frame in ``dense_ids``, the MinHash signature table)
CANNOT be unpersisted before the returned DataFrame is materialized —
range boundaries are re-sampled per action and offsets would silently
mismatch. So release is explicit: every internal ``persist`` goes
through :func:`tracked_persist`, and harness loops (bench.py,
tools/check_oracle.py) call :func:`release_tracked` after each query's
action completes. Long-lived sessions that never call it still get
LRU eviction because everything is MEMORY_AND_DISK, not MEMORY_ONLY.
"""

from __future__ import annotations

import weakref

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

_TRACKED: list[weakref.ReferenceType] = []


def tracked_persist(df: DataFrame, level: StorageLevel | None = None) -> DataFrame:
    """Persist ``df`` (MEMORY_AND_DISK by default) and remember it for a
    later session-wide :func:`release_tracked`."""
    out = df.persist(level or StorageLevel.MEMORY_AND_DISK)
    _TRACKED.append(weakref.ref(out))
    return out


def release_tracked() -> int:
    """Unpersist every DataFrame registered via :func:`tracked_persist`
    that is still alive. Returns the number released. Safe to call at
    any point where no returned-but-unmaterialized plan still depends on
    a tracked cache (i.e. between catalog queries)."""
    released = 0
    global _TRACKED
    for ref in _TRACKED:
        df = ref()
        if df is not None:
            try:
                df.unpersist()
                released += 1
            except Exception:
                pass
    _TRACKED = []
    return released
