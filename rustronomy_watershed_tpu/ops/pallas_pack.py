"""Fused Pallas pack kernel: image -> (v, key, label) relax planes, one pass.

The e2e relax_pallas pipeline previously spent ~1/3 of its device time
OUTSIDE the relax kernel: the jnp seed pipeline (8-neighbour extrema mask +
blocked-MXU prefix numbering, ops/seeds.py) and pack_domain's three
full-plane dynamic-update-slices each round-trip whole planes through HBM.
This kernel fuses all of it into one banded pass at in-kernel DMA bandwidth:

* reads the biased-int8 TRUE image (one cheap u8-size staging pad in jnp),
* computes the reference's seed mask in-VMEM (strict local maxima — all 8
  neighbours < centre, /root/reference/src/lib.rs:1190, quirk Q1 — over the
  TRUE image values, border/padding excluded by a global-coordinate test),
* numbers seeds 1..K in row-major order exactly like ops.seeds.
  seed_labels_from_mask (lane log-prefix + sublane row-offset cumsum per
  band, plus a running seed-count carry in SMEM across the sequential
  band grid — reference enumeration order, src/lib.rs:1358-1369),
* emits the relax kernel's padded domain directly: biased-int8 v with the
  global border rule (border pixels NEVER_FILL, src/lib.rs:220-233), packed
  claim keys (seeds 0, else UNCLAIMED), label plane — aprons included.

Bit-identical to ``pack_domain(img, seed_labels_from_mask(
local_extrema_mask(img)))`` (pinned by tests/test_pallas.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import NEVER_FILL
from .pallas_relax import _UNCLAIMED
_HALO = 8  # mask needs 1 row; 8 keeps sublane DMA slices aligned
_PACK_TILE_CAP = 128  # pack is DMA-bound; short bands keep Mosaic's scoped
# footprint small (the relax kernel's tall stripe tiles OOM'd the pack pass
# at 8448 lanes: 122.96 MiB scoped at tile 352 vs ~40 MiB at 128)


def _pack_tile(h2: int, cap: int = _PACK_TILE_CAP) -> int:
    """Largest 8-multiple band height <= cap dividing the padded height —
    the pack grid is NOT bound to the relax band tile (any divisor grid
    writes the same plane; the sequential seed-count carry works at any
    band height)."""
    for t in range(min(cap, h2), 7, -8):
        if h2 % t == 0:
            return t
    return 8


def pack_prep(
    img,
    tile: int,
    steps: int,
    *,
    wp: int | None = None,
    col_off: int | None = None,
):
    """Biased-int8 staging of the TRUE image onto the padded kernel domain.

    Padding (aprons, lane tail, dead rows) is NEVER_FILL; REAL values are kept
    everywhere incl. the 1-px border — the seed mask must compare against true
    border values (the border rule applies to v only, in-kernel).

    ``wp``/``col_off`` override the default full-width-band geometry (real
    columns at [steps, steps + w)) for the column-blocked relax kernel's
    stripe layout (ops.pallas_relax.resolve_stripe_config).
    """
    img = jnp.asarray(img).astype(jnp.int32)
    h, w = img.shape
    h2 = -(-h // tile) * tile
    p = steps
    if col_off is None:
        col_off = p
    if wp is None:
        wp = -(-(w + 2 * p) // 128) * 128
    out = jnp.full((h2 + 2 * p, wp), NEVER_FILL - 128, dtype=jnp.int8)
    return jax.lax.dynamic_update_slice(
        out, (img - 128).astype(jnp.int8), (p, col_off)
    )


def _pack_kernel(
    img_hbm,
    v_out,
    key_out,
    lab_out,
    nseeds_ref,
    win,
    v_st,
    key_st,
    lab_st,
    cv,
    ck,
    cl,
    carry_ref,
    sems,
    *,
    tile,
    steps,
    real_h,
    real_w,
    col_off,
):
    t, p = tile, steps
    wh = t + 2 * _HALO
    i = pl.program_id(0)
    gy = pl.num_programs(0)
    slot = jax.lax.rem(i, 2)
    nslot = 1 - slot
    wp = win.shape[-1]
    unclaimed = jnp.int32(_UNCLAIMED)

    def dma_in(s, band):
        # img rows [band*t + p - H, band*t + p + t + H): in-bounds since p >= H
        return pltpu.make_async_copy(
            img_hbm.at[pl.ds(band * t + p - _HALO, wh), :],
            win.at[s],
            sems.at[s, 0],
        )

    @pl.when(i == 0)
    def _():
        carry_ref[0] = 0
        dma_in(slot, 0).start()
        # Constant aprons (written to the top here, bottom at the last band).
        cv[...] = jnp.full_like(cv, NEVER_FILL - 128)
        ck[...] = jnp.full_like(ck, unclaimed)
        cl[...] = jnp.zeros_like(cl)
        a1 = pltpu.make_async_copy(cv, v_out.at[pl.ds(0, p), :], sems.at[0, 1])
        a2 = pltpu.make_async_copy(ck, key_out.at[pl.ds(0, p), :], sems.at[0, 2])
        a3 = pltpu.make_async_copy(cl, lab_out.at[pl.ds(0, p), :], sems.at[0, 3])
        for a in (a1, a2, a3):
            a.start()
        for a in (a1, a2, a3):
            a.wait()

    @pl.when(i + 1 < gy)
    def _():
        dma_in(nslot, i + 1).start()

    dma_in(slot, i).wait()

    x = win[slot].astype(jnp.int32)  # biased TRUE values, (wh, wp)

    # Strict-local-max mask (quirk Q1) on centre rows.  Row wrap from the
    # window edge never reaches the centre (halo 8 >= 1); lane wrap only
    # feeds cols 0 / wp-1, which the inside test excludes anyway.
    ok = None
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            nb = x
            if dy:
                nb = pltpu.roll(nb, (-dy) % wh, 0)
            if dx:
                nb = pltpu.roll(nb, (-dx) % wp, 1)
            lt = nb < x
            ok = lt if ok is None else (ok & lt)
    okc = ok[_HALO : _HALO + t, :]
    xc = x[_HALO : _HALO + t, :]

    gr = jax.lax.broadcasted_iota(jnp.int32, (t, wp), 0) + i * t  # real row
    gc = jax.lax.broadcasted_iota(jnp.int32, (t, wp), 1)  # padded col
    inside = (
        (gr >= 1)
        & (gr <= real_h - 2)
        & (gc >= col_off + 1)
        & (gc <= col_off + real_w - 2)
    )
    seed = okc & inside

    # Row-major numbering: lane log-prefix (inclusive) + per-band row offsets
    # + the running carry of seeds in earlier bands.
    m = seed.astype(jnp.int32)
    pref = m
    s = 1
    while s < wp:
        sh = pltpu.roll(pref, s, 1)
        pref = pref + jnp.where(gc >= s, sh, 0)
        s *= 2
    tot = jnp.sum(m, axis=1, keepdims=True)  # (t, 1)
    rincl = tot
    rr = jax.lax.broadcasted_iota(jnp.int32, (t, 1), 0)
    s = 1
    while s < t:
        sh = pltpu.roll(rincl, s, 0)
        rincl = rincl + jnp.where(rr >= s, sh, 0)
        s *= 2
    roff = rincl - tot  # exclusive row offsets
    base = carry_ref[0]
    ranks = pref + roff + base
    carry_ref[0] = base + jnp.sum(m)

    v_st[...] = jnp.where(inside, xc, NEVER_FILL - 128).astype(jnp.int8)
    key_st[...] = jnp.where(seed, jnp.int32(0), unclaimed)
    lab_st[...] = jnp.where(seed, ranks, jnp.int32(0))

    row0 = p + i * t
    c1 = pltpu.make_async_copy(v_st, v_out.at[pl.ds(row0, t), :], sems.at[slot, 1])
    c2 = pltpu.make_async_copy(
        key_st, key_out.at[pl.ds(row0, t), :], sems.at[slot, 2]
    )
    c3 = pltpu.make_async_copy(
        lab_st, lab_out.at[pl.ds(row0, t), :], sems.at[slot, 3]
    )
    for c in (c1, c2, c3):
        c.start()
    for c in (c1, c2, c3):
        c.wait()

    @pl.when(i == gy - 1)
    def _():
        nseeds_ref[0, 0] = carry_ref[0]
        r0 = p + gy * t
        b1 = pltpu.make_async_copy(cv, v_out.at[pl.ds(r0, p), :], sems.at[0, 4])
        b2 = pltpu.make_async_copy(ck, key_out.at[pl.ds(r0, p), :], sems.at[0, 5])
        b3 = pltpu.make_async_copy(cl, lab_out.at[pl.ds(r0, p), :], sems.at[0, 6])
        for b in (b1, b2, b3):
            b.start()
        for b in (b1, b2, b3):
            b.wait()


def pack_domain_fused(
    img,
    tile: int,
    steps: int,
    interpret: bool = False,
    *,
    wp: int | None = None,
    col_off: int | None = None,
):
    """(v_pad, key_pad, lab_pad, n_seeds) — fused seeds + pack, one HBM pass.

    Drop-in replacement for ``pack_domain(img, seed_labels_from_mask(
    local_extrema_mask(img)), tile, steps)`` (plus the seed count).
    ``wp``/``col_off`` select the column-blocked kernel's stripe geometry
    (see pack_prep).
    """
    img = jnp.asarray(img)
    h, w = img.shape
    if steps < _HALO:
        raise ValueError(f"pack_domain_fused needs steps >= {_HALO}")
    if col_off is None:
        col_off = steps
    img8 = pack_prep(img, tile, steps, wp=wp, col_off=col_off)
    hp, wp = img8.shape
    p = steps
    tile = _pack_tile(hp - 2 * p)  # decoupled from the relax band tile
    gy = (hp - 2 * p) // tile
    wh = tile + 2 * _HALO

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(gy,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, wh, wp), jnp.int8),
            pltpu.VMEM((tile, wp), jnp.int8),
            pltpu.VMEM((tile, wp), jnp.int32),
            pltpu.VMEM((tile, wp), jnp.int32),
            pltpu.VMEM((p, wp), jnp.int8),
            pltpu.VMEM((p, wp), jnp.int32),
            pltpu.VMEM((p, wp), jnp.int32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 7)),
        ],
    )
    v_pad, key_pad, lab_pad, nseeds = pl.pallas_call(
        partial(
            _pack_kernel, tile=tile, steps=steps, real_h=h, real_w=w,
            col_off=col_off,
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((hp, wp), jnp.int8),
            jax.ShapeDtypeStruct((hp, wp), jnp.int32),
            jax.ShapeDtypeStruct((hp, wp), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024
        ),
        interpret=interpret,
    )(img8)
    return v_pad, key_pad, lab_pad, nseeds[0, 0]
