"""A/B probe: what does the fused fwd-scan epilogue cost the relax call?

The merging fast path runs ``relax_packed_planes(fwd_scan=True)`` so the
component-min forward pass + single-component stats ride the converging
relax call, but when the single-component broadcast shortcut fires the y0
plane it emitted is UNUSED — only the mstats scalars gate the branch
(ops/level_driver.py).  This probe steady-state-times the relax call with
``fwd_scan=True`` vs ``False`` at the bench geometry, bounding the gain of
a stats-only epilogue mode (BENCHMARKS round-10 "next merging lever"):
the saving = the y0 plane write (one full-plane HBM pass) + the per-band
segmented-min scan compute + the ycarry/yst VMEM (which also caps the
fused tile).

Run on the TPU: ``python tools/probe_epilogue.py [size [inner]]``.
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from rustronomy_watershed_tpu.ops.pallas_relax import relax_packed_planes

    size = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    inner = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    rng = np.random.default_rng(0)
    img = jnp.asarray(
        rng.integers(0, 254, size=(size, size)).astype(np.uint8)
    )
    img = jax.device_put(img)
    jax.block_until_ready(img)

    def one(fwd_scan, im):
        out = relax_packed_planes(im, None, fwd_scan=fwd_scan)
        lab_pad = out[1]
        return jnp.sum(lab_pad.astype(jnp.int32))

    @partial(jax.jit, static_argnames=("fwd_scan", "n"))
    def run_many(im, fwd_scan, n):
        def body(i, acc):
            salt = jnp.where(acc == jnp.int32(-1), 1, 0).astype(im.dtype)
            return acc ^ one(fwd_scan, im + salt)

        return jax.lax.fori_loop(0, n, body, jnp.int32(0))

    for fwd in (True, "stats", False):
        chk = int(run_many(img, fwd, inner))  # compile + warm
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            c = int(run_many(img, fwd, inner))
            times.append(time.perf_counter() - t0)
            assert c == chk
        dt = min(times) / inner
        print(
            f"relax_packed_planes fwd_scan={fwd}: {dt * 1e3:.3f} ms/call "
            f"({size * size / dt / 1e6:.0f} Mpix/s equivalent)"
        )


if __name__ == "__main__":
    main()
