"""Session-scoped persisted-DataFrame caches.

Several contract families fan out from one expensive staged relation (the
(id, grams) shingle sets; the exact near-dup pair list; the IVF-indexed
corpus).  A real pipeline materializes such a relation once and reuses it;
the engine mirrors that with small LRU caches of persisted DataFrames.

Keys include the source DataFrame's SEMANTIC identity — the canonicalized
analyzed plan's hash (``semantic_key``), so a caller that recreates the
same DataFrame (same source, same transformations, fresh object) still
hits — plus every parameter that changes the result.  A strong reference
to the source is held alongside each entry, which also keeps the fallback
``id(df)`` key (used only if the JVM plan call fails) un-recyclable.
Bounded: inserting beyond ``max_size`` unpersists and drops the least-
recently-used entry, so derived-DataFrame callers cannot grow the cache
without bound.  MEMORY_AND_DISK: at 100 TB a hot staged relation spills
instead of OOMing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def semantic_key(df: DataFrame) -> tuple:
    """Stable cache identity of a DataFrame: (semanticHash, canonicalized
    plan string hash) of the ANALYZED logical plan.  Canonicalization
    normalizes expression ids, so two separately constructed but
    semantically identical DataFrames share a key (~0.8 ms/call measured).
    The paired plan-string hash makes a 32-bit semanticHash collision
    harmless.  Falls back to ``id(df)`` (safe while the cache holds a
    strong reference to the source) if the JVM call fails."""
    try:
        plan = df._jdf.queryExecution().analyzed()
        return ("sem", plan.semanticHash(), hash(plan.canonicalized().toString()))
    except Exception:
        return ("id", id(df))


def source_fingerprint(df: DataFrame) -> tuple:
    """Cheap freshness token for correctness-bearing statistic caches: a
    hash over the source scan's file list with each file's (size, mtime).
    Rewriting a table at the same path in-session changes the fingerprint,
    so stale statistics are never served against fresh data (the risk the
    plan-identity key alone cannot see — the rewritten table has the SAME
    analyzed plan).  Driver-side metadata only: ``inputFiles()`` is the
    listing Spark already performs to plan the scan, and the result is
    folded to one int so wide tables don't bloat cache keys.  Returns
    ``("nofp",)`` for non-file sources or on any listing failure — no
    worse than the plain plan key."""
    import os

    try:
        files = df.inputFiles()
        acc = 0
        for uri in sorted(files):
            path = uri[7:] if uri.startswith("file://") else uri
            st = os.stat(path)
            acc = hash((acc, path, st.st_size, st.st_mtime_ns))
        return ("fp", len(files), acc)
    except Exception:
        return ("nofp",)


# Session-scoped approxQuantile boundary cache.  Range-bucketed operators
# (global_rank / global_percent_rank, zorder_value) spend one full-scan job
# per call computing quantile boundaries whose exact values only affect
# bucket BALANCE, never correctness (buckets are value-disjoint for any
# boundary set; ranking and the Z-curve layout stay exact).  A long-lived
# engine computes such table statistics once and reuses them — the same
# staging discipline as the gram caches — so boundaries are cached per
# (application, source plan, columns, grid, error) and the warm path skips
# the scan entirely.  Entries are driver-side float lists (≤ a few KB);
# a strong ref to the source DataFrame keeps the fallback id() key stable.
_QUANTILE_CACHE_MAX = 64
_quantile_cache: dict[tuple, tuple[object, list]] = {}


def approx_quantiles_cached(
    df,
    cols: list[str],
    probs: list[float],
    err: float,
) -> list[list[float]]:
    """``df.approxQuantile(cols, probs, err)`` with session-scoped reuse."""
    key = (
        df.sparkSession.sparkContext.applicationId,
        semantic_key(df),
        tuple(cols),
        # the FULL (rounded) probability vector: len+endpoints alone
        # collide for non-uniform grids with shared ends
        tuple(round(p, 12) for p in probs),
        err,
    )
    hit = _quantile_cache.get(key)
    if hit is not None:
        self_touch = _quantile_cache.pop(key)  # LRU touch: re-insert on hit
        _quantile_cache[key] = self_touch
        return hit[1]
    bounds = df.approxQuantile(list(cols), list(probs), err)
    while len(_quantile_cache) >= _QUANTILE_CACHE_MAX:
        _quantile_cache.pop(next(iter(_quantile_cache)))
    _quantile_cache[key] = (df, bounds)
    return bounds


def clear_quantile_cache() -> None:
    """Pairs with ``relational.clear_bucket_counts_cache()`` on in-session
    table rewrites: boundaries only steer balance (stale is safe), but
    clearing both keeps the statistic caches mutually consistent."""
    _quantile_cache.clear()


class DFCache:
    """LRU cache of persisted DataFrames keyed by (source identity, params).

    ``storage_level`` defaults to MEMORY_AND_DISK; caches holding fan-out
    relations much larger than their source (e.g. the exploded per-token
    relation, 100-200x the document count) should pass ``"DISK_ONLY"`` so a
    hot staged relation never crowds working executor memory — spilling a
    cheap-to-recompute explosion to disk costs far less than evicting live
    shuffle/agg pages at scale."""

    def __init__(self, max_size: int = 8, storage_level: str = "MEMORY_AND_DISK") -> None:
        self.max_size = max_size
        self.storage_level = storage_level
        self._entries: dict[tuple, tuple[object, DataFrame]] = {}

    def get(self, key: tuple) -> DataFrame | None:
        hit = self._entries.get(key)
        if hit is None:
            return None
        self._entries[key] = self._entries.pop(key)  # LRU touch
        return hit[1]

    def put(self, key: tuple, source: object, df: DataFrame) -> DataFrame:
        from pyspark import StorageLevel

        # replacing an existing key must unpersist the old relation —
        # silently overwriting leaks its MEMORY_AND_DISK blocks for the
        # session's lifetime (the eviction loop only sees live entries)
        old = self._entries.pop(key, None)
        if old is not None:
            try:
                old[1].unpersist()
            except Exception:
                pass
        while len(self._entries) >= self.max_size:
            _, old = self._entries.pop(next(iter(self._entries)))
            try:
                old.unpersist()
            except Exception:
                pass
        df = df.persist(getattr(StorageLevel, self.storage_level))
        self._entries[key] = (source, df)
        return df

    def clear(self) -> None:
        for _, df in self._entries.values():
            try:
                df.unpersist()
            except Exception:
                pass
        self._entries.clear()

    def keys(self) -> list[tuple]:
        """Live cache keys — lets callers keep side tables (e.g. the IVF
        centroid arrays) in sync with this cache's eviction."""
        return list(self._entries)

    def __len__(self) -> int:
        return len(self._entries)
