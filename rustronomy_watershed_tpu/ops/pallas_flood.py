"""Pallas TPU kernel: k fused Jacobi flood sweeps per HBM round-trip.

The hot loop of the transform (SURVEY.md §3.2: the per-iteration full-image
window sweep, reference ``find_flooded_px`` src/lib.rs:196-257) is
HBM-bandwidth/fusion-bound as plain jnp.  This kernel time-tiles it:

* the label/image planes live in a **padded domain**: a P-px apron
  (img = NEVER_FILL, so apron cells can never flood) around the image, with
  the real 1-px border also forced to NEVER_FILL — encoding the reference's
  "window centres only" rule in data so the kernel needs no interior masking;
* the grid walks **full-width row bands**: each step DMAs a (T+2P, Wp) band
  (band + P-row halo) into VMEM and runs **P Jacobi steps in registers** —
  information moves one 4-connected pixel per sweep, so the central T rows
  come out bit-identical to P global sweeps.  Full-width bands keep every DMA
  slice lane-aligned (Mosaic requires 128-multiple widths on sliced dims);
* band input/output DMAs are **double-buffered across grid steps** (band i+1
  prefetches while band i computes; output DMAs drain two steps behind), so
  per-band DMA latency is hidden and a call approaches HBM bandwidth;
* neighbour reads use wrap-around rolls.  Row-wrap ghosts live in the band's
  outermost rows, whose corruption propagates at most P-1 rows inward — never
  reaching the central rows.  Column wrap needs no halo at all: the wrapped
  values are only ever read by apron/border columns, which can never flood;
* an early-exit ``lax.cond`` skips steps 2..P when the first sweep changed
  nothing in the band (the common case once a level's wavefront has passed);
* the returned flag is the **last-sweep change on central rows**, OR-ed over
  bands into one SMEM accumulator.  Central rows at internal steps P-1 and P
  equal the global sweeps G_{P-1} and G_P (exactness radius shrinks one ring
  per step, and centres sit >= P rings deep), so flag == False certifies the
  global fixed point: a level whose wavefront dies within P-1 sweeps costs
  ONE kernel call, not a productive call plus a detection call.

HBM traffic per effective sweep drops from ~10 materialised planes (jnp) to
~(12 + 8P/T)/P bytes per pixel.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import INT32_MAX, NEVER_FILL, UNCOLOURED

DEFAULT_TILE = 64  # rows per band
DEFAULT_STEPS = 8  # fused sweeps per HBM round-trip (multiple of 8)


def pad_domain(img, labels, tile: int = DEFAULT_TILE, steps: int = DEFAULT_STEPS):
    """Embed (H, W) image/labels into the padded, row-aligned kernel domain.

    Rows are rounded up to the band size plus a P-row apron top and bottom;
    the padded width is rounded up to a 128 multiple (Mosaic DMA lane
    alignment), with at least a P-col apron.  img_pad is NEVER_FILL outside
    the real region AND on the real border ring (the reference never paints
    border pixels: src/lib.rs:220-233).
    """
    img = jnp.asarray(img).astype(jnp.int32)
    labels = jnp.asarray(labels, dtype=jnp.int32)
    h, w = img.shape
    h2 = -(-h // tile) * tile
    p = steps
    wp = -(-(w + 2 * p) // 128) * 128
    img_eff = img.at[0, :].set(NEVER_FILL)
    img_eff = img_eff.at[-1, :].set(NEVER_FILL)
    img_eff = img_eff.at[:, 0].set(NEVER_FILL)
    img_eff = img_eff.at[:, -1].set(NEVER_FILL)
    shape = (h2 + 2 * p, wp)
    img_pad = jnp.full(shape, NEVER_FILL, dtype=jnp.int32)
    img_pad = jax.lax.dynamic_update_slice(img_pad, img_eff, (p, p))
    lab_pad = jnp.zeros(shape, dtype=jnp.int32)
    lab_pad = jax.lax.dynamic_update_slice(lab_pad, labels, (p, p))
    return img_pad, lab_pad


def _flood_kernel(
    lvl_ref, img_hbm, lab_hbm, out_hbm, chg_ref, img2, lab2, out2, sin, sout, *, tile, steps
):
    t, p = tile, steps
    win = t + 2 * p
    i = pl.program_id(0)
    gy = pl.num_programs(0)
    slot = jax.lax.rem(i, 2)
    nslot = 1 - slot

    def in_dmas(s, band):
        row0 = band * t
        return (
            pltpu.make_async_copy(
                img_hbm.at[pl.ds(row0, win), :], img2.at[s], sin.at[s, 0]
            ),
            pltpu.make_async_copy(
                lab_hbm.at[pl.ds(row0, win), :], lab2.at[s], sin.at[s, 1]
            ),
        )

    def out_dma(s, band):
        return pltpu.make_async_copy(
            out2.at[s], out_hbm.at[pl.ds(band * t + p, t), :], sout.at[s]
        )

    # Warm-up: band 0 fetches itself; every step prefetches band i+1.
    @pl.when(i == 0)
    def _():
        for dma in in_dmas(slot, i):
            dma.start()

    @pl.when(i + 1 < gy)
    def _():
        for dma in in_dmas(nslot, i + 1):
            dma.start()

    for dma in in_dmas(slot, i):
        dma.wait()

    lvl = lvl_ref[0]
    flooded = img2[slot] <= lvl
    lab0 = lab2[slot]
    big = jnp.int32(INT32_MAX)  # materialised inside: kernels can't capture consts
    wp = lab0.shape[1]

    def one_sweep(lab):
        # pltpu.roll requires non-negative shifts: -1 == size - 1 (mod size).
        up = pltpu.roll(lab, 1, 0)
        down = pltpu.roll(lab, win - 1, 0)
        left = pltpu.roll(lab, 1, 1)
        right = pltpu.roll(lab, wp - 1, 1)

        def masked(n):
            return jnp.where(n != UNCOLOURED, n, big)

        nmin = jnp.minimum(
            jnp.minimum(masked(up), masked(down)),
            jnp.minimum(masked(left), masked(right)),
        )
        cand = (lab == UNCOLOURED) & flooded & (nmin != big)
        return jnp.where(cand, nmin, lab)

    lab1 = one_sweep(lab0)
    band_changed = jnp.any(lab1 != lab0)

    def rest(l1):
        def body(_, carry):
            prev, cur = carry
            return cur, one_sweep(cur)

        return jax.lax.fori_loop(0, steps - 1, body, (lab0, l1))

    lab_pm1, lab_final = jax.lax.cond(
        band_changed, rest, lambda l1: (l1, l1), lab1
    )

    # OR-accumulate the last-sweep centre change (global fixed-point witness).
    @pl.when(i == 0)
    def _():
        chg_ref[0, 0] = 0

    centre_changed = jnp.any(lab_final[p : p + t, :] != lab_pm1[p : p + t, :])
    chg_ref[0, 0] = jnp.maximum(chg_ref[0, 0], centre_changed.astype(jnp.int32))

    # Drain the out-DMA issued two steps ago before reusing its slot.
    @pl.when(i >= 2)
    def _():
        out_dma(slot, i - 2).wait()

    out2[slot] = lab_final[p : p + t, :]
    out_dma(slot, i).start()

    @pl.when(i == gy - 1)
    def _():
        out_dma(slot, i).wait()

    @pl.when((i == gy - 1) & (gy >= 2))
    def _():
        out_dma(nslot, i - 1).wait()


@partial(jax.jit, static_argnames=("tile", "steps", "interpret"))
def flood_block(
    img_pad, lab_pad, lvl, *, tile=DEFAULT_TILE, steps=DEFAULT_STEPS, interpret=False
):
    """Run `steps` fused sweeps on the padded domain.

    Returns (new_lab_pad, not_converged).  not_converged == False certifies
    the global per-level fixed point (see module docstring).  The top/bottom
    P-row aprons of new_lab_pad are junk (no band writes them) — harmless by
    construction: every apron cell has img = NEVER_FILL, so apron labels are
    never read by a paintable pixel.
    """
    hp, wp = img_pad.shape
    p = steps
    gy = (hp - 2 * p) // tile
    win = tile + 2 * p

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(gy,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, 1), lambda i, s: (0, 0), memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, win, wp), jnp.int32),
            pltpu.VMEM((2, win, wp), jnp.int32),
            pltpu.VMEM((2, tile, wp), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    lvl_arr = jnp.asarray(lvl, dtype=jnp.int32).reshape((1,))
    new_lab, chg = pl.pallas_call(
        partial(_flood_kernel, tile=tile, steps=steps),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((hp, wp), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,  # raise the 16M scoped default
        ),
        interpret=interpret,
    )(lvl_arr, img_pad, lab_pad)
    return new_lab, chg[0, 0] > 0


def flood_fixed_point_padded(
    img_pad, lab_pad, lvl, *, tile=DEFAULT_TILE, steps=DEFAULT_STEPS, interpret=False
):
    """Iterate flood_block to the per-level fixed point (padded domain)."""

    def cond(state):
        return state[1]

    def body(state):
        lab, _ = state
        return flood_block(
            img_pad, lab, lvl, tile=tile, steps=steps, interpret=interpret
        )

    lab, _ = jax.lax.while_loop(cond, body, (lab_pad, jnp.bool_(True)))
    return lab


def make_sweep_fn(
    tile: int = DEFAULT_TILE, steps: int = DEFAULT_STEPS, interpret: bool = False
):
    """A drop-in ``sweep_fn(img, labels, lvl)`` for the standard (unpadded)
    drivers — pads per call; prefer the padded-domain driver for the hot path."""

    def sweep(img, labels, lvl):
        img_pad, lab_pad = pad_domain(img, labels, tile, steps)
        h, w = labels.shape
        new, _ = flood_block(
            img_pad, lab_pad, lvl, tile=tile, steps=steps, interpret=interpret
        )
        return jax.lax.dynamic_slice(new, (steps, steps), (h, w))

    return sweep
