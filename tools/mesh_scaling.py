"""Mesh scaling study: exchange rounds / kernel runs / ICI bytes vs mesh shape.

Runs the PRODUCTION tiled engine (parallel.tiled_transform,
backend='relax_pallas' — the Mosaic kernel in interpret mode off-TPU) on a
virtual CPU device mesh at a fixed image size, across mesh shapes, and
reports per shape:

  * exchange ROUNDS executed (while-loop iterations of the witness +
    halo-stability protocol),
  * total tile kernel-call RUNS (sum over rounds of tiles with need=True —
    converged tiles skip their call, so runs < rounds x tiles measures the
    straggler-idling the protocol buys),
  * per-round ICI strip payload per tile and aggregate bytes moved
    (static: 2 int32 planes x [2 x k x w_local + 2 x (h_local+2k) x k]
    per tile per round — parallel.halo.refresh_halo_padded's ppermute
    payloads),
  * bit-parity of the labels against the 1x1 result.

Usage (any host):  RWT_MESH_SIZE=256 python tools/mesh_scaling.py
(defaults: size 256, halo from the tuned schedule clamp, shapes
1x1/1x2/2x1/2x2/4x2/4x4/8x4 over RWT_MESH_DEVICES=32 virtual devices).
The round counts are a protocol property (geometry + halo + convergence),
not a platform property — what this measures on the virtual mesh is what
the real multi-chip mesh executes.  The r7 invariant — schedule-aware halo
=> at most ONE extra exchange round over 1x1 — is ASSERTED at every mesh
size (VERDICT r4 #4); RWT_MESH_HALO (a forced narrow halo) disables the
assertion since the invariant is a property of the tuned schedule.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_NDEV = int(os.environ.get("RWT_MESH_DEVICES", "32"))
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + f" --xla_force_host_platform_device_count={_NDEV}"
)
# The ambient axon sitecustomize re-registers the TPU backend when the pool
# env is present — strip it so this study stays off the tunnel.
for k in list(os.environ):
    if "AXON" in k:
        del os.environ[k]

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from rustronomy_watershed_tpu.models.base import _label_bucket
from rustronomy_watershed_tpu.parallel import tiled_transform
from jax.sharding import Mesh


def main():
    size = int(os.environ.get("RWT_MESH_SIZE", "256"))
    halo_env = os.environ.get("RWT_MESH_HALO")
    rng = np.random.default_rng(0)
    img = rng.integers(0, 254, size=(size, size)).astype(np.uint8)

    from rustronomy_watershed_tpu.ops.seeds import (
        local_extrema_mask,
        seed_labels_from_mask,
    )

    labels0 = np.asarray(seed_labels_from_mask(local_extrema_mask(img)))
    bucket = _label_bucket(int(labels0.max()))

    devs = jax.devices()
    shapes = [(1, 1), (1, 2), (2, 1), (2, 2), (4, 2), (4, 4), (8, 4)]
    ref = None
    rounds_1x1 = None
    print(f"image {size}^2, seeds {int(labels0.max())}")
    print(
        f"{'mesh':>5} {'halo':>4} {'tile':>5} {'rounds':>6} {'runs':>5} "
        f"{'skip%':>5} {'strip KiB/tile/round':>20} {'total MiB':>9} parity"
    )
    for ny, nx in shapes:
        n = ny * nx
        if n > len(devs):
            continue
        mesh = Mesh(np.asarray(devs[:n]).reshape(ny, nx), ("y", "x"))
        h_l, w_l = size // ny, size // nx
        from rustronomy_watershed_tpu.ops.tune import relax_steps
        from rustronomy_watershed_tpu.parallel.tiled import (
            _pick_band_tile,
            _round_up8,
        )

        halo = (
            int(halo_env)
            if halo_env
            else max(1, min(relax_steps(w_l), h_l, w_l))
        )
        k = _round_up8(halo)
        tile = _pick_band_tile(h_l, w_l, k)
        out, stats = tiled_transform(
            img,
            labels0,
            mesh,
            n_labels=bucket,
            max_water_level=254,
            merging=False,
            halo=halo,
            backend="relax_pallas",
            with_stats=True,
        )
        out = np.asarray(out)
        rounds, runs = (int(x) for x in np.asarray(stats))
        if ref is None:
            ref = out
            rounds_1x1 = rounds
        elif not halo_env:
            # r7 invariant, pinned at EVERY mesh size (VERDICT r4 #4): the
            # schedule-aware halo costs at most one extra exchange round
            # over the 1x1 mesh.
            assert rounds <= rounds_1x1 + 1, (
                f"{ny}x{nx}: {rounds} rounds > 1x1's {rounds_1x1} + 1"
            )
        par = "OK" if np.array_equal(out, ref) else "DIVERGES"
        strip = 4 * 2 * (2 * k * w_l + 2 * (h_l + 2 * k) * k)
        total = strip * runs  # converged tiles still ride collectives, but
        # their strips are the SAME bytes — count payload once per run-tile
        print(
            f"{ny}x{nx:<3} {k:>4} {tile:>5} {rounds:>6} {runs:>5} "
            f"{100 * (1 - runs / max(1, rounds * n)):>4.0f}% "
            f"{strip / 1024:>20.1f} {total / 2**20:>9.2f} {par}"
        )


if __name__ == "__main__":
    main()
