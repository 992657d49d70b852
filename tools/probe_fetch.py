"""Probe: does the axon tunnel's device->host download scale with
concurrent streams?

The merging ``transform_to_list`` wall is the ~12 MB/s download of the
wire plane (BENCHMARKS.md round 9).  If the tunnel serialises transfers
we are done; if N concurrent fetches deliver ~N x aggregate bandwidth,
the to_list path should fetch the plane in row-chunks from worker
threads.

Pitfall (first revision of this probe): jax.Array caches its host copy
after the first np.asarray, so timings over the SAME device array are
free after rep 1.  Every rep here derives FRESH device arrays (x + it)
and blocks before the timed fetch.

Measures, on the real chip (16 MB of uint32, warm):
  a) one device_get of the whole plane
  b) 4 sequential device_gets of quarter planes
  c) 4 CONCURRENT device_gets of quarter planes (threads)
  d) 8-way version of (c)

Run:  python tools/probe_fetch.py [mb]
"""

import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax.numpy as jnp

    mb = float(sys.argv[1]) if len(sys.argv) > 1 else 16.0
    rows = int(mb * (1 << 20) / 4 / 1024)
    base = jnp.arange(rows * 1024, dtype=jnp.uint32).reshape(rows, 1024)
    base.block_until_ready()
    nbytes = base.size * 4

    def fresh(n, it):
        """n fresh (uncached) device chunks covering the plane."""
        h = rows // n
        parts = [
            (base[i * h : (i + 1) * h] + jnp.uint32(it)) for i in range(n)
        ]
        for p in parts:
            p.block_until_ready()
        return parts

    it = [0]

    def timed(label, n, concurrent, reps=3):
        best = float("inf")
        for _ in range(reps):
            it[0] += 1
            parts = fresh(n, it[0])
            t0 = time.perf_counter()
            if concurrent:
                with ThreadPoolExecutor(n) as ex:
                    list(ex.map(np.asarray, parts))
            else:
                for p in parts:
                    np.asarray(p)
            best = min(best, time.perf_counter() - t0)
        print(f"{label:<40s} {best:6.3f} s  {nbytes / best / 1e6:7.1f} MB/s")
        return best

    timed("a) single device_get", 1, False)
    timed("b) 4 sequential device_gets", 4, False)
    timed("c) 4 concurrent device_gets", 4, True)
    timed("d) 8 concurrent device_gets", 8, True)


if __name__ == "__main__":
    main()
