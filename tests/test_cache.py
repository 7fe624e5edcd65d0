"""Cache observability — footprint cache parity with the reference
(tests/test_cache.py, cache/__init__.py:100-147) + accumulator-backed
counters for the executor-side memos."""

import numpy as np

from mundipy_spark.cache import DistCacheCounters, spatial_cache_footprint
from mundipy_spark.kernels import wkb as wkb_mod


def _box(x0, y0, x1, y1):
    ring = np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], float)
    return ("Polygon", [ring])


def test_cache_none():
    """Reference test_cache.py::test_cache_none: fn returning None is
    passed through and never cached."""

    @spatial_cache_footprint
    def fn(arg):
        return None

    assert fn(_box(-118.84, 34.05, -118.14, 34.55)) is None
    assert fn.cache_info["misses"] == 1
    assert fn.cache_info["currsize"] == 0


def test_cache_footprint_hit_and_counters():
    """A geometry contained in a cached footprint is served from cache;
    hit/miss counters count exactly like the reference's cache_info."""
    calls = []

    @spatial_cache_footprint
    def fn(shape):
        calls.append(shape)
        return ("value", _box(-10, -10, 10, 10))  # footprint: big box

    small = _box(-1, -1, 1, 1)
    assert fn(small) == "value"  # miss: computes + caches footprint
    assert fn(_box(2, 2, 3, 3)) == "value"  # hit: inside footprint
    assert fn(_box(-5, 0, 5, 4)) == "value"  # hit
    assert fn(_box(50, 50, 60, 60)) == "value"  # miss: outside
    assert len(calls) == 2
    assert fn.cache_info["hits"] == 2
    assert fn.cache_info["misses"] == 2
    assert fn.cache_info["currsize"] >= 1


def test_cache_footprint_accepts_wkb_and_maxsize():
    @spatial_cache_footprint(maxsize=2)
    def fn(shape):
        b = wkb_mod.bounds(wkb_mod.loads(shape) if isinstance(shape, bytes) else shape)
        return (b, _box(b[0] - 1, b[1] - 1, b[2] + 1, b[3] + 1))

    for i in range(4):  # distinct footprints evict beyond maxsize
        fn(wkb_mod.dumps(_box(10 * i, 0, 10 * i + 1, 1)))
    assert fn.cache_info["currsize"] == 2
    assert fn.cache_info["misses"] == 4


def test_simhash_memo_counters_distributed(spark):
    """K2 observability: the executor token-hash memo reports aggregate
    hit/miss counts to the DRIVER through accumulators — hits + misses
    equals total vocab lookups, and a re-run over the same corpus on
    warm workers is hit-dominated."""
    from mundipy_spark.operators import dedup

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    c = DistCacheCounters(spark.sparkContext, "token_hash56")
    dedup.simhash_dedup(docs, counters=c).count()
    first = c.cache_info()
    assert first["misses"] > 0
    assert first["hits"] + first["misses"] > 0
    dedup.simhash_dedup(docs, counters=c).count()
    second = c.cache_info()
    # warm memo: the second pass adds mostly hits (local-mode workers
    # are reused; some new-worker forks may add a few misses)
    assert second["hits"] > first["hits"]
