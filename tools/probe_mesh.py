"""Phase attribution for the 1x1-mesh tiled relax path (TPU).

Times, bench.py-style, successively larger prefixes of
parallel.tiled._local_relax_pallas_driver under a 1x1 shard_map:

  init    — v_pad/key_pad/lab_pad construction only
  +run    — init + initial strip refresh + ONE dense kernel round
  full    — the complete driver (while loop + slice + collect tail)

The deltas attribute the mesh tax between setup passes, the kernel round,
and the convergence protocol's residue.
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from rustronomy_watershed_tpu.models.base import _label_bucket
from rustronomy_watershed_tpu.parallel import tiled as T
from rustronomy_watershed_tpu.parallel.halo import (
    exchange_halo,
    global_interior_mask,
)
from rustronomy_watershed_tpu.constants import NEVER_FILL, UNCOLOURED
from rustronomy_watershed_tpu.ops import pallas_relax as pr

INNER = 64
SIZE = int(os.environ.get("PROBE_SIZE", "4096"))
K = 32


def steady(fn, *args, reps=3):
    @jax.jit
    def run(*a):
        def body(i, carry):
            salt, acc = carry
            out = fn(salt, *a)
            chk = out.reshape(-1)[0].astype(jnp.int32) ^ out.reshape(-1)[
                -1
            ].astype(jnp.int32)
            salt = jnp.where(chk == jnp.int32(-123456789), 1, 0).astype(jnp.int32)
            return salt, acc ^ chk

        _, acc = jax.lax.fori_loop(0, INNER, body, (jnp.int32(0), jnp.int32(0)))
        return acc

    np.asarray(run(*args))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(run(*args))
        times.append(time.perf_counter() - t0)
    return min(times) / INNER * 1e3


def driver_prefix(img_tile, lab_tile, *, stage, band_tile, halo, global_shape):
    axis_y, axis_x = "y", "x"
    control_axes = ("y", "x")
    b, h, w = lab_tile.shape
    k = halo
    nf8 = jnp.int8(NEVER_FILL - 128)
    v8 = (img_tile.astype(jnp.int32) - 128).astype(jnp.int8)
    v_p = exchange_halo(v8, k, axis_y, axis_x, off_grid_fill=NEVER_FILL - 128)
    interior = global_interior_mask((h, w), global_shape, k, axis_y, axis_x)
    v_p = jnp.where(interior, v_p, nf8)
    wp = -(-(w + 2 * k) // 128) * 128
    v_pad = jnp.full((b, h + 2 * k, wp), nf8, dtype=jnp.int8)
    v_pad = jax.lax.dynamic_update_slice(v_pad, v_p, (0, 0, 0))

    lab0 = lab_tile.astype(jnp.int32)
    unclaimed = jnp.int32(pr._UNCLAIMED)
    key0 = jnp.where(lab0 != UNCOLOURED, jnp.int32(0), unclaimed)
    hp = h + 2 * k
    key_pad = jnp.full((b, hp, wp), unclaimed, dtype=jnp.int32)
    key_pad = jax.lax.dynamic_update_slice(key_pad, key0, (0, k, k))
    lab_pad = jnp.zeros((b, hp, wp), dtype=jnp.int32)
    lab_pad = jax.lax.dynamic_update_slice(lab_pad, lab0, (0, k, k))
    if stage == "init":
        return (
            v_pad[0, ::512, ::512].astype(jnp.int32)
            + key_pad[0, ::512, ::512]
            + lab_pad[0, ::512, ::512]
        )

    from rustronomy_watershed_tpu.parallel.halo import refresh_halo_padded

    kp, _ = refresh_halo_padded(
        key_pad, k, h, w, axis_y, axis_x,
        off_grid_fill=pr._UNCLAIMED, return_strips=True,
    )
    lp, _ = refresh_halo_padded(
        lab_pad, k, h, w, axis_y, axis_x,
        off_grid_fill=UNCOLOURED, return_strips=True,
    )
    gy = h // band_tile
    active = jnp.ones((gy,), jnp.int32)
    k2, l2, _, nc, _ = pr.relax_block(
        v_pad[0], kp[0], lp[0], active,
        tile=band_tile, steps=k, pipelined=True, ctr_cols=(k, k + w),
    )
    return l2[::512, ::512] + k2[::512, ::512]


def main():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 254, size=(SIZE, SIZE)).astype(np.uint8)
    from rustronomy_watershed_tpu.ops.seeds import (
        local_extrema_mask,
        seed_labels_from_mask,
    )

    with jax.default_device(jax.devices()[0]):
        labels0 = np.asarray(
            jax.jit(lambda im: seed_labels_from_mask(local_extrema_mask(im)))(img)
        )
    bucket = _label_bucket(int(labels0.max()))
    mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1), ("y", "x"))
    band_tile = T._pick_band_tile(SIZE, SIZE, K)
    img_d = jax.device_put(jnp.asarray(img))
    lab_d = jax.device_put(jnp.asarray(labels0))
    jax.block_until_ready((img_d, lab_d))

    floor = steady(lambda s, im: im[:8, :128].astype(jnp.int32) + s, img_d)
    print(f"floor {floor:.2f} ms  (size {SIZE}, band_tile {band_tile})")

    for stage in ["init", "run"]:
        fn = jax.shard_map(
            partial(
                driver_prefix,
                stage=stage,
                band_tile=band_tile,
                halo=K,
                global_shape=(SIZE, SIZE),
            ),
            mesh=mesh,
            in_specs=(P("y", "x"), P("y", "x")),
            out_specs=P(None, None),
            check_vma=False,
        )
        t = steady(
            lambda s, im, lb, f=fn: f(
                (im + s.astype(jnp.uint8))[None], lb[None]
            ),
            img_d,
            lab_d,
        )
        print(f"  {stage:5s} {t - floor:6.2f} ms")

    full = jax.shard_map(
        partial(
            T._local_relax_pallas_driver,
            global_shape=(SIZE, SIZE),
            n_labels=bucket,
            max_water_level=254,
            merging=False,
            halo=K,
            collect="none",
            axis_y="y",
            axis_x="x",
            control_axes=("y", "x"),
            band_tile=band_tile,
            interpret=False,
        ),
        mesh=mesh,
        in_specs=(P("y", "x"), P("y", "x")),
        out_specs=P("y", "x"),
        check_vma=False,
    )
    t = steady(
        lambda s, im, lb: full((im + s.astype(jnp.uint8))[None], lb[None])[
            0, ::512, ::512
        ],
        img_d,
        lab_d,
    )
    print(f"  full  {t - floor:6.2f} ms")


if __name__ == "__main__":
    main()
