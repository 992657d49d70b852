"""Pallas TPU kernels: k fused Jacobi flood sweeps per HBM round-trip.

The hot loop of the transform (SURVEY.md §3.2: the per-iteration full-image
window sweep, reference ``find_flooded_px`` src/lib.rs:196-257) is
HBM-bandwidth/fusion-bound as plain jnp.  This kernel time-tiles and
sparsifies it:

* the label/image planes live in a **padded domain**: a P-px apron
  (img = NEVER_FILL, so apron cells can never flood) around the image, with
  the real 1-px border also forced to NEVER_FILL — encoding the reference's
  "window centres only" rule in data so the kernel needs no interior masking.
  The image plane is stored as int8 (value - 128) for 4x less DMA traffic;
* the grid walks **full-width row bands**: an active band DMAs its (T+2P, Wp)
  window (band + P-row halo) into VMEM and runs **P Jacobi steps in
  registers** — information moves one 4-connected pixel per sweep, so the
  central T rows come out bit-identical to P global sweeps.  Full-width bands
  keep every DMA slice lane-aligned (Mosaic needs 128-multiple widths);
* an **activity vector** (scalar-prefetched) makes inactive bands cost
  nothing: at a level's first call only bands containing a pixel of value
  exactly L can flood (at the previous level's fixed point every uncoloured
  frontier pixel has value >= L), and afterwards only bands whose centre
  changed last call — or their immediate neighbours (information moves <= P
  < T rows per call) — can change;
* labels are **per-band ping-pong buffered**: a ``cur`` bitmap says which of
  two HBM label buffers holds each band's current rows.  Reads source the
  ``cur`` side (never written this call), and a band that painted its centre
  writes the flipped side; idle bands move zero bytes.  Both buffers are
  aliased inputs->outputs, so unwritten bands persist for free;
* neighbour reads use wrap-around rolls.  Row-wrap ghosts live in the band's
  outermost rows, whose corruption propagates at most P-1 rows inward — never
  reaching the central rows.  Column wrap needs no halo at all: the wrapped
  values are only ever read by apron/border columns, which can never flood;
* change flags are derived from the paint predicate ``cand`` (no extra
  whole-plane compares) and restricted to **centre rows** (halo ghosts would
  otherwise keep signalling change at the fixed point and hang the driver);
* the returned scalar flag is the OR over bands of the **last-sweep centre
  change**.  Centre rows at internal steps P-1 and P equal the global sweeps
  G_{P-1} and G_P (the exactness radius shrinks one ring per sweep and
  centres sit >= P rings deep), so flag == False certifies the global fixed
  point: a level whose wavefront dies within P-1 sweeps costs ONE call.
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


def _img_to_i8(img_i32):
    return (img_i32 - 128).astype(jnp.int8)


def pad_domain(img, labels, tile: int = DEFAULT_TILE, steps: int = DEFAULT_STEPS):
    """Embed (H, W) image/labels into the padded, row-aligned kernel domain.

    Rows are rounded up to the band size plus a P-row apron top and bottom;
    the padded width is rounded up to a 128 multiple (Mosaic DMA lane
    alignment), with at least a P-col apron.  img_pad is NEVER_FILL outside
    the real region AND on the real border ring (the reference never paints
    border pixels: src/lib.rs:220-233), then biased to int8 (value - 128).
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
    return _img_to_i8(img_pad), lab_pad


def band_histogram(img, tile: int = DEFAULT_TILE) -> jnp.ndarray:
    """(gy, 256) pixel-value counts per row band of the (H, W) image —
    drives the first-call activity set of each water level."""
    img = jnp.asarray(img).astype(jnp.int32)
    h, w = img.shape
    h2 = -(-h // tile) * tile
    gy = h2 // tile
    pad = jnp.full((h2, w), NEVER_FILL, dtype=jnp.int32)
    pad = jax.lax.dynamic_update_slice(pad, img, (0, 0))
    bands = pad.reshape(gy, tile * w)
    rows = jax.lax.broadcasted_iota(jnp.int32, bands.shape, 0)
    out = jnp.zeros((gy, 256), dtype=jnp.int32)
    return out.at[rows.reshape(-1), bands.reshape(-1)].add(
        jnp.ones(bands.size, dtype=jnp.int32), mode="drop"
    )


def _flood_kernel(
    lvl_ref,
    active_ref,
    curp_ref,
    img_hbm,
    bufa_in,
    bufb_in,
    bufa_out,
    bufb_out,
    flags_ref,
    chg_ref,
    img2,
    lab2,
    sems,
    *,
    tile,
    steps,
    pipelined,
):
    t, p = tile, steps
    win = t + 2 * p
    i = pl.program_id(0)
    gy = pl.num_programs(0)
    slot = jax.lax.rem(i, 2)
    nslot = 1 - slot

    @pl.when(i == 0)
    def _():
        chg_ref[0, 0] = 0

    flags_ref[i, 0] = 0

    def start_in_dmas(s, band):
        # Window assembly: image + three label regions from the `cur` side of
        # the ping-pong pair (top halo owned by band-1, centre by band,
        # bottom halo by band+1; curp is cur padded one entry each side so no
        # clamping is needed; aprons are identical in both buffers).
        row0 = band * t
        pltpu.make_async_copy(
            img_hbm.at[pl.ds(row0, win), :], img2.at[s], sems.at[s, 0]
        ).start()
        regions = (
            (row0, 0, p, curp_ref[band]),
            (row0 + p, p, t, curp_ref[band + 1]),
            (row0 + p + t, p + t, p, curp_ref[band + 2]),
        )
        for k, (src_row, dst_row, nrows, which) in enumerate(regions):

            @pl.when(which == 0)
            def _():
                pltpu.make_async_copy(
                    bufa_in.at[pl.ds(src_row, nrows), :],
                    lab2.at[s, pl.ds(dst_row, nrows), :],
                    sems.at[s, k + 1],
                ).start()

            @pl.when(which != 0)
            def _():
                pltpu.make_async_copy(
                    bufb_in.at[pl.ds(src_row, nrows), :],
                    lab2.at[s, pl.ds(dst_row, nrows), :],
                    sems.at[s, k + 1],
                ).start()

    def wait_in_dmas(s, band):
        # Wait by byte count: both source branches copy identical shapes.
        row0 = band * t
        pltpu.make_async_copy(
            img_hbm.at[pl.ds(row0, win), :], img2.at[s], sems.at[s, 0]
        ).wait()
        for k, (src_row, dst_row, nrows) in enumerate(
            ((row0, 0, p), (row0 + p, p, t), (row0 + p + t, p + t, p))
        ):
            pltpu.make_async_copy(
                bufa_in.at[pl.ds(src_row, nrows), :],
                lab2.at[s, pl.ds(dst_row, nrows), :],
                sems.at[s, k + 1],
            ).wait()

    def compute_and_write():
        row0 = i * t

        # --- P fused sweeps.
        lvl = lvl_ref[0]  # already biased to int8 range by the caller
        flooded = img2[slot] <= lvl
        lab0 = lab2[slot]
        big = jnp.int32(INT32_MAX)
        wp = lab0.shape[1]

        def one_sweep(lab):
            # pltpu.roll needs non-negative shifts: -1 == size - 1 (mod size).
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
            painted_win = jnp.any(cand)
            painted_ctr = jnp.any(cand[p : p + t, :])
            return jnp.where(cand, nmin, lab), painted_win, painted_ctr

        lab1, painted1_win, painted1_ctr = one_sweep(lab0)

        def rest(args):
            l1, c1 = args

            def body(_, carry):
                lab, anyc, _ = carry
                new, _, cc = one_sweep(lab)
                return new, anyc | cc, cc

            return jax.lax.fori_loop(0, steps - 1, body, (l1, c1, c1))

        lab_final, any_ctr, last_ctr = jax.lax.cond(
            painted1_win,
            rest,
            lambda args: (args[0], args[1], args[1]),
            (lab1, painted1_ctr),
        )

        flags_ref[i, 0] = any_ctr.astype(jnp.int32)
        chg_ref[0, 0] = jnp.maximum(chg_ref[0, 0], last_ctr.astype(jnp.int32))

        # --- Write the centre to the flipped buffer iff it changed.
        @pl.when(any_ctr)
        def _():
            lab2[slot, p : p + t, :] = lab_final[p : p + t, :]

            @pl.when(curp_ref[i + 1] == 0)
            def _():
                pltpu.make_async_copy(
                    lab2.at[slot, pl.ds(p, t), :],
                    bufb_out.at[pl.ds(row0 + p, t), :],
                    sems.at[slot, 4],
                ).start()
                pltpu.make_async_copy(
                    lab2.at[slot, pl.ds(p, t), :],
                    bufb_out.at[pl.ds(row0 + p, t), :],
                    sems.at[slot, 4],
                ).wait()

            @pl.when(curp_ref[i + 1] != 0)
            def _():
                pltpu.make_async_copy(
                    lab2.at[slot, pl.ds(p, t), :],
                    bufa_out.at[pl.ds(row0 + p, t), :],
                    sems.at[slot, 4],
                ).start()
                pltpu.make_async_copy(
                    lab2.at[slot, pl.ds(p, t), :],
                    bufa_out.at[pl.ds(row0 + p, t), :],
                    sems.at[slot, 4],
                ).wait()

    if pipelined:
        # Dense mode: UNCONDITIONAL cross-band DMA pipelining (band i+1's
        # window prefetches during band i's compute).  The semaphore flow is
        # static — only the DMA *source* (A vs B per region) is
        # data-dependent, which is the hardware-proven in-step pattern.
        # Activity only gates compute/writes (pure VPU + in-step DMAs).
        # NOTE: conditional cross-step issue/wait pairing (skipping the
        # prefetch for inactive bands) deadlocks the DMA engine — do not.
        @pl.when(i == 0)
        def _():
            start_in_dmas(slot, i)

        @pl.when(i + 1 < gy)
        def _():
            start_in_dmas(nslot, i + 1)

        wait_in_dmas(slot, i)

        @pl.when(active_ref[i] > 0)
        def _():
            compute_and_write()
    else:
        # Sparse mode: only active bands touch HBM at all.
        @pl.when(active_ref[i] > 0)
        def _():
            start_in_dmas(slot, i)
            wait_in_dmas(slot, i)
            compute_and_write()


def flood_block(
    img_pad,
    buf_a,
    buf_b,
    lvl,
    active,
    cur,
    *,
    tile=DEFAULT_TILE,
    steps=DEFAULT_STEPS,
    interpret=False,
    pipelined=False,
):
    """One activity-gated kernel call of `steps` fused sweeps.

    Args:
      img_pad: int8 biased image plane (pad_domain output).
      buf_a / buf_b: the ping-pong label planes (aliased to the outputs).
      lvl: water level (0..254).
      active: (gy,) int32 — bands allowed to change this call.
      cur: (gy,) int32 — which buffer (0=A, 1=B) holds each band's rows.

    Returns (buf_a', buf_b', flags, not_converged): flags[i] != 0 iff band
    i's centre changed (the band wrote its flipped buffer — the caller must
    flip ``cur`` accordingly and dilate flags into the next active set);
    not_converged == False certifies the per-level global fixed point.
    """
    hp, wp = img_pad.shape
    p = steps
    gy = (hp - 2 * p) // tile
    win = tile + 2 * p

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(gy,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((gy, 1), lambda i, *_: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i, *_: (0, 0), memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, win, wp), jnp.int8),
            pltpu.VMEM((2, win, wp), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 5)),
        ],
    )

    lvl_arr = (jnp.asarray(lvl, dtype=jnp.int32) - 128).reshape((1,))
    active = jnp.asarray(active, dtype=jnp.int32)
    cur = jnp.asarray(cur, dtype=jnp.int32)
    curp = jnp.concatenate([cur[:1], cur, cur[-1:]])

    buf_a2, buf_b2, flags, chg = pl.pallas_call(
        partial(_flood_kernel, tile=tile, steps=steps, pipelined=pipelined),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((hp, wp), jnp.int32),
            jax.ShapeDtypeStruct((hp, wp), jnp.int32),
            jax.ShapeDtypeStruct((gy, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ],
        input_output_aliases={4: 0, 5: 1},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(lvl_arr, active, curp, img_pad, buf_a, buf_b)
    return buf_a2, buf_b2, flags[:, 0], chg[0, 0] > 0


def gather_current(buf_a, buf_b, cur, *, tile=DEFAULT_TILE, steps=DEFAULT_STEPS):
    """Assemble one padded label plane from the per-band ping-pong pair."""
    hp, wp = buf_a.shape
    p = steps
    rows = jnp.arange(hp, dtype=jnp.int32)
    band = jnp.clip((rows - p) // tile, 0, cur.shape[0] - 1)
    mask = (cur[band] != 0)[:, None]
    return jnp.where(mask, buf_b, buf_a)


def _dilate_flags(flags: jnp.ndarray) -> jnp.ndarray:
    """Next call's active set: changed bands and their neighbours."""
    up = jnp.concatenate([flags[1:], jnp.zeros((1,), flags.dtype)])
    down = jnp.concatenate([jnp.zeros((1,), flags.dtype), flags[:-1]])
    return flags | up | down


def flood_fixed_point_padded(
    img_pad,
    buf_a,
    buf_b,
    cur,
    lvl,
    first_active,
    *,
    tile=DEFAULT_TILE,
    steps=DEFAULT_STEPS,
    interpret=False,
):
    """Iterate flood_block to the per-level global fixed point.

    ``first_active``: (gy,) int32 — bands that may flood at this level's
    first call (bands containing a pixel of value exactly lvl).
    Returns (buf_a, buf_b, cur, painted_any).
    """

    def cond(state):
        return state[4]

    def body(state):
        a, b, cur, active, _, painted = state
        gy = active.shape[0]
        # Dense calls (>1/3 of bands active — e.g. a level's first call on a
        # noisy field) use the DMA-pipelined kernel; sparse calls skip idle
        # bands' HBM traffic entirely.
        a, b, flags, not_conv = jax.lax.cond(
            jnp.sum(active) * 3 > gy,
            lambda args: flood_block(
                *args, tile=tile, steps=steps, interpret=interpret, pipelined=True
            ),
            lambda args: flood_block(
                *args, tile=tile, steps=steps, interpret=interpret, pipelined=False
            ),
            (img_pad, a, b, lvl, active, cur),
        )
        cur = cur ^ flags
        painted = painted | jnp.any(flags != 0)
        return a, b, cur, _dilate_flags(flags), not_conv, painted

    a, b, cur, _, _, painted = jax.lax.while_loop(
        lambda s: s[4],
        body,
        (buf_a, buf_b, cur, first_active, jnp.bool_(True), jnp.bool_(False)),
    )
    return a, b, cur, painted


def make_sweep_fn(
    tile: int = DEFAULT_TILE, steps: int = DEFAULT_STEPS, interpret: bool = False
):
    """A drop-in ``sweep_fn(img, labels, lvl)`` for the standard (unpadded)
    drivers — pads per call; prefer the padded-domain driver for the hot path."""

    def sweep(img, labels, lvl):
        img_pad, lab_pad = pad_domain(img, labels, tile, steps)
        h, w = labels.shape
        gy = (img_pad.shape[0] - 2 * steps) // tile
        ones = jnp.ones((gy,), jnp.int32)
        zeros = jnp.zeros((gy,), jnp.int32)
        a, b, flags, _ = flood_block(
            img_pad, lab_pad, lab_pad * 1, lvl, ones, zeros,
            tile=tile, steps=steps, interpret=interpret,
        )
        new = gather_current(a, b, flags, tile=tile, steps=steps)
        return jax.lax.dynamic_slice(new, (steps, steps), (h, w))

    return sweep
