"""Measure XLA gather / scatter-min / table-jump costs on the real chip.

Decision probe for the masked-merging tail redesign (VERDICT r5 #1): a
pointer-jump accelerator needs (a) plane-sized gathers ``T[v]`` (M random
indices into a K-entry table), (b) K-sized table self-jumps ``T[T]``, and
ideally (c) a plane->table scatter-min build.  The r2 ledger says 4M-entry
scatter/gather ops measured 170-400 ms through the tunnel — this probe
separates gather from scatter and re-measures on the current toolchain.

Times with the serially-dependent fori_loop methodology (BENCHMARKS.md):
each iteration's indices depend on the previous result, so iterations
cannot overlap and the ~26 ms dispatch amortises away.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from functools import partial


def timed(fn, *args, inner=8, reps=3):
    f = jax.jit(partial(fn, inner=inner))
    out = jax.block_until_ready(f(*args))  # compile
    _ = float(np.asarray(out).ravel()[0])
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(*args)
        _ = float(np.asarray(out).ravel()[0])  # forced scalar fetch
        best = min(best, (time.perf_counter() - t0) / inner)
    return best


def main():
    print("platform:", jax.devices()[0])
    rng = np.random.default_rng(0)

    for M, K in ((16_777_216, 2_097_152), (67_108_864, 8_388_608)):
        idx = jnp.asarray(rng.integers(0, K, size=M, dtype=np.int32))
        tab = jnp.asarray(rng.integers(0, K, size=K, dtype=np.int32))
        jax.block_until_ready((idx, tab))

        def plane_gather(idx, tab, inner):
            def body(_, i):
                y = tab[i]  # M-sized gather from K table
                # serialise: next indices derived from this result
                return (i + y) % K
            return jax.lax.fori_loop(0, inner, body, idx)

        t = timed(plane_gather, idx, tab)
        print(f"M={M>>20}M K={K>>20}M plane gather T[v]: {t*1e3:8.2f} ms "
              f"({M/t/1e9:.2f} G elem/s)")

        def table_jump(tab, inner):
            def body(_, t):
                return t[t]  # K-sized self-gather
            return jax.lax.fori_loop(0, inner, body, tab)

        t = timed(table_jump, tab)
        print(f"            table jump  T[T]: {t*1e3:8.2f} ms "
              f"({K/t/1e9:.2f} G elem/s)")

        vals = jnp.asarray(rng.integers(0, K, size=M, dtype=np.int32))

        def scatter_min(idx, vals, inner):
            def body(_, carry):
                i, v = carry
                t = jnp.full((K,), np.iinfo(np.int32).max, jnp.int32)
                t = t.at[i].min(v)
                return (i, jnp.minimum(v, t[i] + 0))  # depend on result
            return jax.lax.fori_loop(0, inner, body, (idx, vals))[1]

        t = timed(scatter_min, idx, vals, inner=4)
        print(f"            scatter-min plane->table: {t*1e3:8.2f} ms "
              f"({M/t/1e9:.2f} G elem/s)")


if __name__ == "__main__":
    main()
