"""Steady-state bench of the MESH engine on real hardware (1x1 mesh).

The distributed path (parallel.tiled_transform: shard_map + the per-tile
packed-key Mosaic kernel + psum convergence + halo plumbing) is
correctness-tested on the virtual 8-device CPU mesh and parity-checked on
chip by the battery; this tool measures what the mesh WRAPPING costs at
full size on one real chip — a 1x1 mesh runs degenerate collectives but
the complete shard_map machinery, so (dense-engine throughput) minus
(this number) is the single-chip overhead of mesh readiness.

bench.py methodology: ``inner`` serially-dependent transforms inside ONE
jitted lax.fori_loop, forced by a scalar fetch, exact int32 checksum
asserted across every iteration and rep.  Run on the TPU:
``python tools/bench_tiled.py [size [halo]]``.
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
    from jax.sharding import Mesh

    from rustronomy_watershed_tpu.models.base import _label_bucket
    from rustronomy_watershed_tpu.parallel import tiled_transform

    size = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    halo = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    rng = np.random.default_rng(0)
    img = rng.integers(0, 254, size=(size, size)).astype(np.uint8)

    # Seeds as the builder derives them (host strict-local-maxima, Q1) —
    # the SAME criterion bench.py's e2e path computes on device (the fused
    # pack kernel / ops.seeds.local_extrema_mask 'reference' mode), so
    # (dense − tiled) is a pure mesh-overhead comparison on one workload.
    hh, ww = img.shape
    ok = np.ones((hh - 2, ww - 2), dtype=bool)
    centre = img[1:-1, 1:-1]
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            ok &= img[1 + dy : hh - 1 + dy, 1 + dx : ww - 1 + dx] < centre
    mask = np.zeros((hh, ww), dtype=bool)
    mask[1:-1, 1:-1] = ok
    labels0 = (np.cumsum(mask.ravel()).reshape(hh, ww) * mask).astype(np.int32)
    n_seeds = int(labels0.max())
    bucket = _label_bucket(n_seeds)

    mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1), ("y", "x"))
    img_d = jax.device_put(jnp.asarray(img))
    lab_d = jax.device_put(jnp.asarray(labels0))
    jax.block_until_ready((img_d, lab_d))

    def checksum(lab):
        lab = lab.reshape(-1).astype(jnp.int32)
        pos = jax.lax.iota(jnp.int32, lab.shape[0]) * jnp.int32(-1640531527)
        return jnp.sum(lab) ^ jnp.sum(lab * pos)

    npx = size * size
    inner = int(max(16, min(1024, round(2600.0 / (npx / 1.3e6)))))

    @partial(jax.jit, static_argnames=("n",))
    def run_many(im, lab0, n):
        def body(i, carry):
            chk_prev, acc = carry
            salt = jnp.where(chk_prev == jnp.int32(-123456789), 1, 0).astype(
                jnp.uint8
            )
            out = tiled_transform(
                im + salt,
                lab0,
                mesh,
                n_labels=bucket,
                max_water_level=254,
                merging=False,
                halo=halo,
                backend="relax_pallas",
            )
            chk = checksum(out)
            return chk, acc.at[i].set(chk)

        _, acc = jax.lax.fori_loop(
            0, n, body, (jnp.int32(0), jnp.zeros((n,), jnp.int32))
        )
        return acc

    acc = np.asarray(run_many(img_d, lab_d, inner))
    assert np.all(acc == acc[0]), f"nondeterministic: {acc}"
    chk0 = acc[0]
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        acc = np.asarray(run_many(img_d, lab_d, inner))
        times.append(time.perf_counter() - t0)
        assert np.all(acc == chk0)

    dt = min(times) / inner
    print(
        f"tiled 1x1-mesh {size}^2 segmenting (halo={halo}): "
        f"{npx / dt / 1e6:.0f} Mpix/s ({dt * 1e3:.2f} ms per transform, "
        f"inner={inner}, seeds={n_seeds})"
    )


if __name__ == "__main__":
    main()
