"""Steady-state phase breakdown of the relax_pallas segmenting transform.

Times each phase with the bench.py methodology (N serially-dependent
iterations inside one jitted fori_loop, forced by a scalar fetch) and
subtracts a calibrated per-iteration harness floor (the ~26 ms tunnel
dispatch divided by the inner count — measured with a trivial op, NOT
assumed).  Run on the TPU: ``python tools/profile_phases.py [size ...]``.
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

INNER = 8


def steady(fn, *args, reps=3):
    """min wall ms per iteration of fn(salt, *args) chained via a salt."""

    @jax.jit
    def run(*a):
        def body(i, carry):
            salt, acc = carry
            out = fn(salt, *a)
            chk = out.reshape(-1)[0].astype(jnp.int32) ^ out.reshape(-1)[-1].astype(
                jnp.int32
            )
            salt = jnp.where(chk == jnp.int32(-123456789), 1, 0).astype(jnp.int32)
            return salt, acc ^ chk

        _, acc = jax.lax.fori_loop(0, INNER, body, (jnp.int32(0), jnp.int32(0)))
        return acc

    np.asarray(run(*args))  # compile + warm
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(run(*args))
        times.append(time.perf_counter() - t0)
    return min(times) / INNER * 1e3


def main():
    from rustronomy_watershed_tpu.ops import pallas_relax as pr
    from rustronomy_watershed_tpu.ops.pallas_pack import pack_domain_fused
    from rustronomy_watershed_tpu.ops.pipeline import watershed_e2e_impl
    from rustronomy_watershed_tpu.ops.scan_merge import component_min_labels

    sizes = [int(a) for a in sys.argv[1:]] or [1024, 4096]
    for size in sizes:
        rng = np.random.default_rng(0)
        img = jax.device_put(
            jnp.asarray(rng.integers(0, 254, size=(size, size)).astype(np.uint8))
        )
        jax.block_until_ready(img)
        from rustronomy_watershed_tpu.ops.tune import relax_steps

        steps = relax_steps(size)
        tile = pr.auto_tile(size, steps)
        v_pad, key_pad, lab_pad, _ = jax.jit(
            partial(pack_domain_fused, tile=tile, steps=steps)
        )(img)
        seg = jax.jit(
            partial(watershed_e2e_impl, max_water_level=254, backend="relax_pallas")
        )(img)
        jax.block_until_ready((v_pad, key_pad, lab_pad, seg))

        floor = steady(lambda s, im: im.astype(jnp.int32) + s, img)
        rows = {
            "e2e seg": steady(
                lambda s, im: watershed_e2e_impl(
                    im + s.astype(jnp.uint8), backend="relax_pallas"
                ),
                img,
            ),
            "e2e merge": steady(
                lambda s, im: watershed_e2e_impl(
                    im + s.astype(jnp.uint8), merging=True, backend="relax_pallas"
                ),
                img,
            ),
            "pack_fused": steady(
                lambda s, im: pack_domain_fused(
                    im + s.astype(jnp.uint8), tile, steps
                )[1],
                img,
            ),
            "relax_fp": steady(
                lambda s, v, k, l: pr.relax_fixed_point(
                    v, k + s, l, tile=tile, steps=steps
                )[1],
                v_pad,
                key_pad,
                lab_pad,
            ),
            "scan_merge": steady(
                lambda s, lab: component_min_labels(lab + s, use_pallas=True),
                seg,
            ),
        }
        tput = size * size / (rows["e2e seg"] - floor) / 1e3
        print(f"== {size}x{size} (tile {tile}) :: e2e {tput:.0f} Mpix/s ==")
        print(f"  harness floor {floor:8.2f} ms/iter (subtracted below)")
        for k, v in rows.items():
            print(f"  {k:10s} {v - floor:8.2f} ms")


if __name__ == "__main__":
    main()
