"""Host scaling ceiling for ALLOCATION-HEAVY string work, next to the
pure-arithmetic burn in BENCH/scaling.py.

Why two calibrations: the sandbox's 32 vCPUs share one memory system.
Pure-register arithmetic (the burn) loses ~25% per-core throughput when
all 32 are busy; allocation-heavy string work (split/join churn — the
memory regime of the paragraph-dedup explode) loses considerably more,
because every thread is hammering the allocator and the shared memory
bandwidth. A string-regime job measured against the arithmetic ceiling
therefore looks like it "fails to scale" even when it is already at
the hardware's own limit for that kind of work. On a real cluster the
N -> 4N step adds MACHINES (each with its own memory system), so
neither ceiling applies — this is strictly a single-VM artifact.

Usage: python BENCH/strchurn.py [low high]   (default 8 32)
Prints one line per regime: throughput at both levels + the N -> 4N
scaling ceiling for that regime on this host.
"""

from __future__ import annotations

import sys
import time
from multiprocessing import Pool

TEXT = (
    "lorem ipsum dolor sit amet consectetur adipiscing elit sed do "
    "eiusmod tempor incididunt ut labore et dolore magna aliqua "
) * 8


def churn(_):
    """Split/join string churn: the paragraph-explode memory regime."""
    h = 0
    for i in range(20000):
        toks = (TEXT + str(i)).split()
        for k in range(0, len(toks), 12):
            h ^= hash(" ".join(toks[k : k + 12]))
    return h


def arith(_):
    """Pure-register arithmetic: the BENCH/scaling.py burn."""
    x = 0
    for i in range(30_000_000):
        x += i * i
    return x


def thr(fn, n: int, reps: int = 3) -> float:
    best = 0.0
    with Pool(n) as p:
        for _ in range(reps):
            t0 = time.time()
            p.map(fn, range(n))
            best = max(best, n / (time.time() - t0))
    return best


def main() -> None:
    low = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    high = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    for name, fn in [("string", churn), ("arith", arith)]:
        t_lo, t_hi = thr(fn, low), thr(fn, high)
        ceiling = (t_hi / t_lo) / (high / low)
        print(
            f"{name}: thr{low}={t_lo:.2f} thr{high}={t_hi:.2f} "
            f"ceiling_{low}to{high}={ceiling:.3f}"
        )


if __name__ == "__main__":
    main()
