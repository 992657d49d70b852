"""Steady-state phase breakdown of the relax_pallas segmenting transform.

Times each phase with the bench.py methodology (N serially-dependent
iterations inside one jitted fori_loop, forced by a scalar fetch) so tunnel
dispatch latency is amortised.  Run on the TPU: ``python tools/profile_phases.py
[size ...]``.
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def steady(fn, *args, inner=8, reps=3):
    """min wall time per iteration of fn, serially chained via a salt."""

    @partial(jax.jit, static_argnames=())
    def run(*a):
        def body(i, carry):
            salt, acc = carry
            out = fn(salt, *a)
            chk = jnp.sum(out.reshape(-1)[:: max(1, out.size // 997)]).astype(
                jnp.int32
            )
            salt = jnp.where(chk == jnp.int32(-123456789), 1, 0).astype(jnp.int32)
            return salt, acc ^ chk

        _, acc = jax.lax.fori_loop(0, inner, body, (jnp.int32(0), jnp.int32(0)))
        return acc

    np.asarray(run(*args))  # compile + warm
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(run(*args))
        times.append(time.perf_counter() - t0)
    return min(times) / inner


def main():
    from rustronomy_watershed_tpu.ops import pallas_relax as pr
    from rustronomy_watershed_tpu.ops.pipeline import watershed_e2e_impl
    from rustronomy_watershed_tpu.ops.seeds import (
        local_extrema_mask,
        seed_labels_from_mask,
    )

    sizes = [int(a) for a in sys.argv[1:]] or [1024, 4096]
    for size in sizes:
        rng = np.random.default_rng(0)
        img = jax.device_put(
            jnp.asarray(rng.integers(0, 254, size=(size, size)).astype(np.uint8))
        )
        jax.block_until_ready(img)
        tile = pr.auto_tile(size)
        labels0 = jax.jit(lambda im: seed_labels_from_mask(local_extrema_mask(im)))(
            img
        )
        v_pad, key_pad, lab_pad = jax.jit(
            partial(pr.pack_domain, tile=tile, steps=pr.DEFAULT_STEPS)
        )(img, labels0)
        jax.block_until_ready((labels0, v_pad, key_pad, lab_pad))

        rows = {}
        rows["e2e"] = steady(
            lambda s, im: watershed_e2e_impl(
                im + s.astype(jnp.uint8), backend="relax_pallas"
            ),
            img,
        )
        rows["seeds"] = steady(
            lambda s, im: seed_labels_from_mask(
                local_extrema_mask(im + s.astype(jnp.uint8))
            ),
            img,
        )
        rows["pack"] = steady(
            lambda s, im, l0: pr.pack_domain(
                im + s.astype(jnp.uint8), l0, tile, pr.DEFAULT_STEPS
            )[1],
            img,
            labels0,
        )
        rows["relax_fp"] = steady(
            lambda s, v, k, l: pr.relax_fixed_point(
                v, k + s, l, tile=tile, steps=pr.DEFAULT_STEPS
            )[1],
            v_pad,
            key_pad,
            lab_pad,
        )
        tput = size * size / rows["e2e"] / 1e6
        print(f"== {size}x{size} (tile {tile}) :: e2e {tput:.0f} Mpix/s ==")
        for k, v in rows.items():
            print(f"  {k:10s} {v * 1e3:8.2f} ms")


if __name__ == "__main__":
    main()
