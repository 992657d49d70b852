"""Attribute the dot-NaN SEGMENTING gap (VERDICT r4 #6).

r11 measured segmenting 4096² at 1695 Mpix/s on a 10%-dot field vs 1912
dense, and established (probe_nan_tail) that both converge in ONE dense
relax call — so the +1.1 ms is in-call sweep work.  This probe produces the
evidence the verdict asked for: a BAND-ACTIVITY HISTOGRAM from the relax
kernel's own witness counters (relax_block's per-band change flags,
recorded per call while driving the fixed point eagerly at a small steps
schedule), plus relax-only amortised timings at the production schedule.

Interpretation: with steps=s, call c's active flags mark bands whose claim
chains were still advancing after ~c*s sweeps — the per-call active-band
count IS the distribution of chain depth across the image.  On maze (dot)
fields the histogram's tail is long and wide (most bands stay active to
high sweep counts, so the early-exit saves little and every sweep pays the
full roll set); on dense fields it collapses after the first few calls.

Run on TPU: python tools/probe_nan_relax.py [size]
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

    from rustronomy_watershed_tpu.ops.ckpt_relax import _step_impl
    from rustronomy_watershed_tpu.ops.pallas_relax import (
        pack_domain,
        resolve_relax_config,
    )
    from rustronomy_watershed_tpu.ops.pallas_pack import pack_domain_fused
    from rustronomy_watershed_tpu.ops.pallas_relax import relax_packed_planes
    from rustronomy_watershed_tpu.ops.seeds import (
        local_extrema_mask,
        seed_labels_from_mask,
    )

    size = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    probe_steps = int(os.environ.get("RWT_PROBE_STEPS", "4"))
    rng = np.random.default_rng(0)
    dense = rng.integers(0, 254, size=(size, size)).astype(np.uint8)
    dots = dense.copy()
    dots[rng.random((size, size)) < 0.1] = 255

    for name, img in (("dense", dense), ("dots", dots)):
        img_d = jax.device_put(jnp.asarray(img))
        lab0 = seed_labels_from_mask(local_extrema_mask(img_d))

        # (a) relax-only amortised time at the PRODUCTION schedule
        def relax_only(im, n):
            def body(_, acc):
                out = relax_packed_planes(im, None)
                return acc + out[1][8, 8]

            return jax.lax.fori_loop(0, n, body, jnp.int32(0))

        f = jax.jit(partial(relax_only, n=8))
        int(f(img_d))  # warm via scalar fetch (block_until_ready returns
        # early on this platform — CLAUDE.md environment facts)
        t0 = time.perf_counter()
        int(f(img_d))
        dt = (time.perf_counter() - t0) / 8
        print(f"{name}: relax-only {dt * 1e3:7.2f} ms/iter", flush=True)

        # (b) band-activity histogram at a small steps schedule
        steps, tile = resolve_relax_config(size, size, steps=probe_steps)
        v_pad, key, lab = pack_domain(img_d, lab0, tile, steps)
        gy = (v_pad.shape[0] - 2 * steps) // tile
        active = jnp.ones((gy,), jnp.int32)
        sat = jnp.zeros((gy,), jnp.int32)
        step = jax.jit(
            partial(_step_impl, tile=tile, steps=steps, interpret=False)
        )
        hist = []
        for call in range(400):
            key, lab, active, nc, sat = step(v_pad, key, lab, active, sat)
            hist.append(int(jnp.sum(active > 0)))
            if not bool(nc):
                break
        print(
            f"{name}: steps={steps} tile={tile} bands={gy}; active bands "
            f"per call: {hist}",
            flush=True,
        )


if __name__ == "__main__":
    main()
