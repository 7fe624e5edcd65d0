"""Spatial caches with observable hit/miss counters (reference
mundipy/cache/__init__.py).

Two layers, matching how caching actually works on Spark:

1. `spatial_cache_footprint` — the reference's footprint decorator
   (cache/__init__.py:100-147, tests/test_cache.py): the wrapped fn
   returns (result, footprint); later calls whose query geometry is
   CONTAINED in a cached footprint are served from the cache. Per
   process (on Spark: per Python worker), with the reference's
   `cache_info` hit/miss counters plus maxsize/currsize.

2. `DistCacheCounters` — Spark-accumulator-backed counters that
   executor-side memos (the simhash token-hash memo, the decoded-
   polygon memos) report into, so a DRIVER can read aggregate hit/miss
   numbers after an action — the observability a user tuning a slow
   100 TB job actually needs (worker-local dicts are invisible from
   the driver).
"""

from __future__ import annotations

from mundipy_spark.kernels import predicates, wkb


def _as_geom(shape):
    if shape is None:
        return None
    if isinstance(shape, tuple):
        return shape
    if isinstance(shape, (bytes, bytearray, memoryview)):
        return wkb.loads(bytes(shape))
    geom = getattr(shape, "geom", None)  # Feature
    if geom is not None:
        return geom
    raise TypeError(
        "first arg passed to spatial_cache_footprint is not a geometry, or None"
    )


def spatial_cache_footprint(fn=None, maxsize: int = 128):
    """Cache `fn` for all geometries that fit within the returned
    footprint (reference cache/__init__.py:100-147).

    The wrapped fn takes a geometry (tuple / WKB bytes / Feature / None)
    first and must return (result, footprint) — footprint None means
    "do not cache" — or None (returned as-is, not cached, matching
    reference test_cache.py::test_cache_none). MRU-ordered list capped
    at maxsize. `wrapped.cache_info` carries hits/misses/maxsize/
    currsize (the reference exposes hits/misses)."""
    if fn is None:  # used as @spatial_cache_footprint(maxsize=N)
        return lambda f: spatial_cache_footprint(f, maxsize=maxsize)

    cache: list[tuple[object, tuple]] = []
    cache_info = {"hits": 0, "misses": 0, "maxsize": maxsize, "currsize": 0}

    def check_cache_first(*args, **kwargs):
        nonlocal cache
        if len(args) < 1:
            raise TypeError(
                "zero args passed to function expecting one (spatial_cache_footprint)"
            )
        shape = _as_geom(args[0])
        if shape is not None:
            for res, fp in cache:
                if predicates.contains(fp, shape):
                    cache_info["hits"] += 1
                    return res
        cache_info["misses"] += 1
        out = fn(*args, **kwargs)
        if out is None:
            return None
        res, footprint = out
        if footprint is not None:
            cache = [(res, _as_geom(footprint))] + cache[: maxsize - 1]
            cache_info["currsize"] = len(cache)
        return res

    check_cache_first.cache_info = cache_info
    return check_cache_first


def _item_geom(item):
    g = getattr(item, "geom", None)  # Feature
    if g is not None:
        return g
    return _as_geom(item)


def union_spatial_cache(fn=None, maxsize: int = 128):
    """Area-containment cache for region-query functions (reference
    cache/__init__.py:15-98): fn's last positional arg is a query
    geometry and it returns the list of geometries/Features found
    inside. Cached regions (same `pcs` kwarg) contribute their items
    clipped to the overlap; fn runs only on the REMAINING area; results
    union. One sound deviation from the reference: new results are
    keyed by the area fn actually ran on (the reference keys by the
    full query geometry, which can serve later queries an incomplete
    list for the already-covered part). Reference-parity caveat kept
    as-is: an item straddling the boundary between a cached region and
    the freshly-queried remainder is returned once from each side —
    the reference has the same behavior (its `# TODO drop duplicates`,
    cache/__init__.py:97); deduping would need geometry equality the
    reference does not define. `wrapped.cache_info` counts a hit per
    cached region used and a miss per fn invocation."""
    if fn is None:
        return lambda f: union_spatial_cache(f, maxsize=maxsize)

    from mundipy_spark.kernels import measure, overlay

    cache: list[tuple[tuple, list]] = []  # ((geom, pcs), items) area-desc
    cache_info = {"hits": 0, "misses": 0, "maxsize": maxsize, "currsize": 0}

    def check_cache_first(*args, **kwargs):
        nonlocal cache
        if len(args) == 0:
            raise TypeError("union_spatial_cache fn must be passed >= 1 argument")
        geom = args[-1]
        if geom is None:  # pass through (reference cache/__init__.py:41-42)
            return fn(*args, **kwargs)
        g = _as_geom(geom)
        pcs = kwargs.get("pcs", "EPSG:4326")

        remaining = g
        all_items: list = []
        for (cg, cpcs), items in cache:
            if remaining is None:
                break
            if cpcs != pcs or not predicates.intersects(cg, remaining):
                continue
            if predicates.covers(remaining, cg):
                all_items.extend(items)
            else:
                inter = overlay.intersection(cg, remaining)
                if inter is None or measure.geom_area_planar(inter) == 0.0:
                    continue
                all_items.extend(
                    it for it in items if predicates.intersects(_item_geom(it), inter)
                )
            cache_info["hits"] += 1
            remaining = overlay.overlay_op(remaining, cg, "difference")

        if remaining is not None and measure.geom_area_planar(remaining) > 0.0:
            cache_info["misses"] += 1
            result = fn(*args[:-1], remaining, **kwargs)
            all_items.extend(result)
            cache = sorted(
                [((remaining, pcs), list(result))] + cache[: maxsize - 1],
                key=lambda c: -measure.geom_area_planar(c[0][0]),
            )
            cache_info["currsize"] = len(cache)
        return all_items

    check_cache_first.cache_info = cache_info
    return check_cache_first


class DistCacheCounters:
    """Hit/miss counters an executor-side memo reports into, readable
    from the driver after any action. Accumulators are add-only from
    tasks — exactly the shape a cache counter needs."""

    def __init__(self, sc, name: str = "cache"):
        self.name = name
        self.hits = sc.accumulator(0)
        self.misses = sc.accumulator(0)

    def record(self, hits: int, misses: int) -> None:
        if hits:
            self.hits.add(int(hits))
        if misses:
            self.misses.add(int(misses))

    def cache_info(self) -> dict:
        return {"name": self.name, "hits": self.hits.value, "misses": self.misses.value}
