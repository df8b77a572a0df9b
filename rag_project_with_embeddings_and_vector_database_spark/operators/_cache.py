"""Scoped per-operator persist registry (shared by the dedup pair
generators and BM25): operators that read a derived frame from BOTH
sides of a join (or several aggregation branches) persist() it, but a
long-lived session calling them repeatedly must not accumulate cache
entries — so each operator key holds AT MOST ONE persisted frame; a new
call swaps the previous one out, and ``release_caches()`` drops all.

At 100 TB the same role is played by writing the intermediate table out
(signature/postings tables are reused across runs anyway); the session
cache is the single-job equivalent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_CACHE: dict[str, DataFrame] = {}


def swap_cache(key: str, df: DataFrame) -> DataFrame:
    """Persist ``df`` under ``key``, unpersisting the key's previous
    frame. Unpersisting the old frame is safe even if a previously
    returned DataFrame is still unexecuted — it simply recomputes
    without the cache."""
    prev = _CACHE.get(key)
    if prev is not None:
        prev.unpersist(blocking=False)
    df = df.persist()
    _CACHE[key] = df
    return df


def release_caches() -> None:
    """Unpersist every scoped operator cache."""
    for df in _CACHE.values():
        df.unpersist(blocking=False)
    _CACHE.clear()
