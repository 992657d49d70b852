"""Attribution probe for the merging scan tail (_bwd_vh_kernel).

Times, with the bench.py steady-state methodology, banded passes over a
4096² int32 plane that share the tail kernel's structure but differ in
compute:

  copy      — dma_in + dma_out only (the pipelined DMA floor)
  bwdv      — + backward vertical segmented scan (sublane rolls)
  bwdv+h    — + both horizontal scans (lane rolls)  [= the real tail]
  tail      — the actual _bwd_vh_kernel via _call_round_kernel

If copy ≈ tail the pass is DMA-bound (read/write do NOT overlap at the
78 GB/s figure); if tail >> copy the lane-roll h-scans bind and cutting
them is worth real milliseconds.
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rustronomy_watershed_tpu.ops import scan_merge as sm

INNER = int(os.environ.get("PROBE_INNER", "64"))


def steady(fn, *args, reps=3):
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

    np.asarray(run(*args))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(run(*args))
        times.append(time.perf_counter() - t0)
    return min(times) / INNER * 1e3


def _probe_kernel(y_hbm, out_hbm, chg_ref, win, ost, carry, edge, sems, *, tile,
                  real_h, col_lo, col_hi, mode):
    """Structure-matched variant of sm._bwd_vh_kernel with reducible compute."""
    j = pl.program_id(0)
    gy = pl.num_programs(0)
    i = gy - 1 - j
    slot = jax.lax.rem(j, 2)
    nslot = 1 - slot
    wp = win.shape[-1]
    inf = jnp.int32(sm._INF)

    def dma_in(s, band):
        return pltpu.make_async_copy(
            y_hbm.at[pl.ds(band * tile, tile), :], win.at[s], sems.at[s, 0]
        )

    @pl.when(j == 0)
    def _():
        chg_ref[0, 0] = 0
        carry[...] = jnp.full_like(carry, inf)
        edge[...] = jnp.zeros_like(edge)
        dma_in(slot, i).start()

    @pl.when(j + 1 < gy)
    def _():
        dma_in(nslot, i - 1).start()

    dma_in(slot, i).wait()
    y = win[slot]

    if mode == "copy":
        out = y
    else:
        rr = jax.lax.broadcasted_iota(jnp.int32, (tile, wp), 0)
        cc = jax.lax.broadcasted_iota(jnp.int32, (tile, wp), 1)
        reset = y == 0
        v, b = sm._seg_min_scan(
            jnp.where(reset, inf, y), reset.astype(jnp.int32), 0, tile, True, rr
        )
        final = jnp.where(b != 0, v, jnp.minimum(v, carry[...]))
        carry[...] = jnp.min(
            jnp.where(rr == 0, final, inf), axis=0, keepdims=True
        )
        z = jnp.where(reset, 0, final)
        z = jnp.where((cc == col_lo) | (cc == col_hi), y, z)
        if mode == "bwdv":
            out = z
        else:  # bwdv+h
            zres = z == 0
            zres_i = zres.astype(jnp.int32)
            hv, _ = sm._seg_min_scan(
                jnp.where(zres, inf, z), zres_i, 1, wp, False, cc
            )
            hv, _ = sm._seg_min_scan(hv, zres_i, 1, wp, True, cc)
            out = jnp.where(zres, 0, hv)
            grow = rr + i * tile
            out = jnp.where((grow == 0) | (grow == real_h - 1), z, out)

    ost[...] = out
    co = pltpu.make_async_copy(
        ost, out_hbm.at[pl.ds(i * tile, tile), :], sems.at[slot, 1]
    )
    co.start()
    co.wait()


def probe_pass(src, *, tile, mode):
    hp, wp = src.shape
    gy = hp // tile
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(gy,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, tile, wp), jnp.int32),
            pltpu.VMEM((tile, wp), jnp.int32),
            pltpu.VMEM((1, wp), jnp.int32),
            pltpu.VMEM((1, wp), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    out, _ = pl.pallas_call(
        partial(_probe_kernel, tile=tile, real_h=hp, col_lo=0, col_hi=wp - 1,
                mode=mode),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((hp, wp), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=112 * 1024 * 1024),
    )(src)
    return out


def main():
    size = int(os.environ.get("PROBE_SIZE", "4096"))
    tile = int(os.environ.get("PROBE_TILE", "0")) or sm._round_tile(size)
    rng = np.random.default_rng(0)
    lab = rng.integers(1, 2**20, size=(size, size)).astype(np.int32)
    lab[rng.random(size=(size, size)) < 0.004] = 0  # NEVER_FILL-like barriers
    lab = jax.device_put(jnp.asarray(lab))
    jax.block_until_ready(lab)

    floor = steady(lambda s, x: x[:8, :128] + s, lab)
    print(f"size {size} tile {tile}  harness floor {floor:.2f} ms")
    for mode in ["copy", "bwdv", "bwdv+h"]:
        t = steady(lambda s, x, m=mode: probe_pass(x + s, tile=tile, mode=m), lab)
        print(f"  {mode:8s} {t - floor:6.2f} ms")
    t = steady(
        lambda s, x: sm._call_round_kernel(
            sm._bwd_vh_kernel, x + s, tile=tile, interpret=False,
            real_h=size, col_lo=0, col_hi=size - 1,
        )[0],
        lab,
    )
    print(f"  tail     {t - floor:6.2f} ms")


if __name__ == "__main__":
    main()
