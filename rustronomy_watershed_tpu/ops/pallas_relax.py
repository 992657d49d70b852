"""Pallas TPU kernel for the priority-relaxation engine (ops.priority).

The relaxation needs only ~O(longest claim chain) whole-image sweeps
(measured: 29 at 4096²), so P sweeps fused per HBM round-trip brings the
whole segmenting transform down to a handful of kernel calls.

Representation: the lexicographic key (L, d) packs into ONE int32,
``key = L << 23 | d`` with

* L in 0..254 for claimed pixels (claims at L > NORMAL_MAX are rejected —
  the reference never floods at 255 — so the packed key never overflows),
* unclaimed sentinel = 255 << 23 (level 255, d = 0).  This exact choice
  makes the whole candidate update branch-free: the lexicographic extend
  ``(max(v, L), d+1-or-1)`` is ``max(ext, vcand)`` with the SATURATING
  increment ``ext = min(kq + 1, kq | D_MASK)`` (see one_sweep) — equal to
  ``kq + 1`` whenever d < 2^23-1, pinned at (L, 2^23-1) once d hits the
  field maximum so the +1 can never carry into the level field.  The
  sentinel's extend = (255<<23)|1 still carries level 255, so unclaimed
  neighbours can never donate a claim and nothing overflows,
* seeds = 0 (L=0, d=0): every candidate key is >= (0<<23|1) = 1, so seeds
  are immutable with no special-casing,
* d at the fixed point is the plateau BFS ring index: the GEODESIC
  distance through the equal-level plateau to its claim entry point.  For
  a serpentine plateau that scales with plateau AREA (not the image
  diameter), so a single >= 2^23-px plateau — possible from 2897² up — can
  saturate the field.  Saturation degrades gracefully: rings beyond
  2^23-1 tie at (L, 2^23-1), where claims still complete but label
  donation needs a strictly-smaller neighbour key, so pixels deep inside
  such a monster plateau may stay UNCOLOURED.  The exact-unpacked jnp
  engine (ops.priority, 32-bit d) has no such limit.  This is DETECTED
  in-kernel (a claimed pixel with label 0 at the fixed point — the exact
  starvation signature; see the sat_ref comment in _relax_kernel) and
  surfaced as a ``starved`` flag up through relax_fixed_point /
  relax_transform_pallas / run_levels(with_flags=True); the public API
  (models.base) warns and re-runs on the exact engine
  (tests/test_saturation.py drives the whole path at a scaled-down
  _D_BITS — a real 2^23-ring trigger needs ~8.4M Jacobi sweeps on ANY
  engine, including the reference, so no full-size run is practical).

Bands follow the flood kernel's layout (full-width rows, P-row halo,
wrap-rolls with ghost corruption confined to the discarded halo) plus the
flood kernel's two proven perf techniques (ops/pallas_flood.py):

* **in-place aliased state**: the key/label planes are aliased
  inputs->outputs and bands write only their changed centre rows.  This is
  single-buffer (no ping-pong): a band may read halo rows its neighbour
  already updated this call (Gauss-Seidel order) or is concurrently
  writing (per-element old-or-new).  Both are safe — keys decrease
  monotonically toward the unique fixed point, so any old/new mixture is a
  valid asynchronous-relaxation state, and labels have a unique solution
  given the key fixed point (strict-key DAG).  Convergence is only
  declared on a call in which NO band changed, i.e. no writes raced at all;
* **band activity gating**: the first call runs every band; afterwards
  only bands whose centre changed last call — or their immediate
  neighbours (information moves <= P < T rows per call) — can change.
  Dense calls (>1/3 bands active) use unconditional cross-band DMA
  pipelining; sparse calls skip idle bands' HBM traffic entirely.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .._compat import register_vmem_recovery
from ..constants import NEVER_FILL, UNCOLOURED
from .scan_merge import _INF as _SCAN_INF, _seg_min_scan

DEFAULT_TILE = 256
DEFAULT_STEPS = 16


# Scoped-VMEM ceiling for the relax kernel.  The chip total is 128 MiB;
# Mosaic's own scoped-allocation reports (r6 sweep at 8192², steps=32)
# bracket what fits: win=216 rows = 122.33 MiB compiles and RUNS at a
# 123 MiB limit, win=232 = ~131 MiB does not fit even at 127 MiB.  The
# r2-r5 112 MiB setting left ~9% of the chip's VMEM (one 8-row tile step
# at 8192 width) unused.  r7: raised 123 -> 125 MiB after the platform
# toolchain drift inflated the same win=216 config to 123.06 MiB (see
# _WIN_ELEM_BYTES_X10) — compile+RUN verified on hardware at 125.
VMEM_LIMIT_BYTES = 125 * 1024 * 1024

# Runtime drift resilience (VERDICT r3 #3): scoped-VMEM footprints of an
# UNCHANGED kernel drift with the platform toolchain (r7: +0.73 MiB on the
# identical win=216 config between sessions).  When a public entry's compile
# dies with a Mosaic scoped-allocation OOM, _compat.cache_resilient calls
# the step-down hook below: it widens a session-wide DERATE subtracted from
# every tile-resolution budget (auto_tile / _stripe_auto_tile /
# resolve_relax_config / resolve_stripe_config), clears the jit caches, and
# the retry re-resolves a smaller tile down the same auto_tile schedule —
# graceful degradation instead of a hard failure on VMEM-marginal configs.
# The Mosaic compiler cap itself (CompilerParams vmem_limit_bytes) stays at
# VMEM_LIMIT_BYTES: the chip's scoped ceiling did not move, the footprint
# model under-estimated.
_VMEM_DERATE_STEP = 2 * 1024 * 1024
_VMEM_DERATE_MAX = 16 * 1024 * 1024
_vmem_derate = 0


def vmem_budget() -> int:
    """The tile-resolution VMEM budget: the hardware-bracketed ceiling minus
    the session's drift derate (see _VMEM_DERATE_STEP)."""
    return VMEM_LIMIT_BYTES - _vmem_derate


def _vmem_drift_stepdown() -> bool:
    """Recovery hook for _compat.cache_resilient: bump the derate one step
    (False once exhausted — the caller re-raises the compile error)."""
    global _vmem_derate
    if _vmem_derate + _VMEM_DERATE_STEP > _VMEM_DERATE_MAX:
        return False
    _vmem_derate += _VMEM_DERATE_STEP
    import warnings

    warnings.warn(
        "Mosaic scoped-VMEM compile OOM: platform footprint drift detected "
        f"(see ops/pallas_relax.py); derating the tile-resolution budget to "
        f"{vmem_budget() // (1 << 20)} MiB for this session and retrying "
        "with a smaller band tile",
        RuntimeWarning,
        stacklevel=2,
    )
    return True


def _reset_vmem_derate() -> None:
    """Testing hook: clear the session derate."""
    global _vmem_derate
    _vmem_derate = 0


register_vmem_recovery(_vmem_drift_stepdown)

# Measured footprint per window element ×10, from Mosaic's scoped-allocation
# error sizes (r6, v5e): 117.82 MiB at win=208×8320 and 122.33 MiB at
# win=216×8320 — linear through the origin at 71.4 B/elem (the r5 "66 B"
# figure compared a decimal-byte budget against Mosaic's MiB report).
# r7 recalibration: the remote compile helper's toolchain DRIFTED between
# sessions — the EXACT r6 kernel revision (pre-saturation-detector,
# verified compiling AND running at win=216×8320 = 122.33 MiB in r6) now
# reports 123.06 MiB at the same config, 66 KiB over the limit (A/B
# isolated with compile-only probes of both revisions; the detector adds
# ~0.01 MiB on top).  Footprints measured on this platform are therefore
# only valid within a session-ish horizon; the model keeps the freshest
# bracket: 71.8 B/elem.
_WIN_ELEM_BYTES_X10 = 718

# Fallback-bound safety slack for widths nobody has measured (the measured
# table entries are validated against the un-slacked model instead).
_AUTO_TILE_SLACK = 1 << 20


def vmem_model_bytes(
    width: int, steps: int, tile: int, fused_scan: bool = False
) -> int:
    """Modeled scoped-VMEM bytes of one relax_block call (see the
    _WIN_ELEM_BYTES_X10 calibration).  The fwd-scan epilogue (merging path)
    adds its 4 B/centre-element yst staging block — verified against the
    fused win=192 OOM report (113.0 MiB = 71.5 B/elem + 4 B × tile × wp)."""
    wp = -(-(width + 2 * steps) // 128) * 128
    b = (tile + 2 * steps) * wp * _WIN_ELEM_BYTES_X10 // 10
    if fused_scan:
        b += 4 * tile * wp
    return b


def auto_tile(
    width: int,
    steps: int = DEFAULT_STEPS,
    fused_scan: bool = False,
    cap: int | None = None,
) -> int:
    """Band height fitting the kernel's VMEM footprint at this image width:
    the largest 8-multiple whose vmem_model_bytes stays a safety slack under
    VMEM_LIMIT_BYTES, capped at ``cap`` (default DEFAULT_TILE — a safe
    generic choice for unmeasured widths; the measured table goes taller
    where the r6 sweep showed taller bands win).

    The measured table (ops.tune.RELAX_TILE_TABLE) takes precedence at
    measured widths (validated against the un-slacked model — hardware
    brackets sit within the slack of the limit); this bound is the fallback
    — and the fused path's cap on the segmenting-measured table tiles,
    whose epilogue-less footprint under-budgets the merging variant (the
    8192² table tile OOM'd the merging path at HEAD r5).
    """
    if cap is None:
        cap = DEFAULT_TILE
    wp = -(-(width + 2 * steps) // 128) * 128
    per10 = wp * _WIN_ELEM_BYTES_X10
    extra10 = 40 * wp if fused_scan else 0
    tile = (
        ((vmem_budget() - _AUTO_TILE_SLACK) * 10 - 2 * steps * per10)
        // (per10 + extra10)
        // 8
        * 8
    )
    return int(max(8, min(cap, tile)))

_D_BITS = 23
_D_MASK = (1 << _D_BITS) - 1
_UNCLAIMED = NEVER_FILL << _D_BITS  # (255, d=0) — see module docstring
_BIG_LAB = jnp.int32(2**30)


def pack_domain(
    img,
    labels0,
    tile: int = DEFAULT_TILE,
    steps: int = DEFAULT_STEPS,
    *,
    wp: int | None = None,
    col_off: int | None = None,
):
    """(v_pad int8-biased, key_pad int32, lab_pad int32) padded planes.

    Real 1-px border forced to NEVER_FILL (window-centre rule); aprons are
    NEVER_FILL / unclaimed / 0 — apron restarts are rejected by vcand's
    min-clamp and an unclaimed key's extend still carries level 255, so
    aprons never claim and never propagate (see the kernel comment).

    Default geometry puts real data at (steps, steps); the column-blocked
    kernel passes ``wp``/``col_off`` for its stripe layout (real columns at
    [col_off, col_off + w), lane halo _STRIPE_HALO per side).
    """
    img = jnp.asarray(img).astype(jnp.int32)
    labels0 = jnp.asarray(labels0, dtype=jnp.int32)
    h, w = img.shape
    h2 = -(-h // tile) * tile
    p = steps
    if col_off is None:
        col_off = p
    if wp is None:
        wp = -(-(w + 2 * p) // 128) * 128
    v = img.at[0, :].set(NEVER_FILL)
    v = v.at[-1, :].set(NEVER_FILL)
    v = v.at[:, 0].set(NEVER_FILL)
    v = v.at[:, -1].set(NEVER_FILL)
    shape = (h2 + 2 * p, wp)
    v_pad = jnp.full(shape, NEVER_FILL, dtype=jnp.int32)
    v_pad = jax.lax.dynamic_update_slice(v_pad, v, (p, col_off))
    seeds = labels0 != UNCOLOURED
    key = jnp.where(seeds, jnp.int32(0), jnp.int32(_UNCLAIMED))
    key_pad = jnp.full(shape, _UNCLAIMED, dtype=jnp.int32)
    key_pad = jax.lax.dynamic_update_slice(key_pad, key, (p, col_off))
    lab_pad = jnp.zeros(shape, dtype=jnp.int32)
    lab_pad = jax.lax.dynamic_update_slice(lab_pad, labels0, (p, col_off))
    return (v_pad - 128).astype(jnp.int8), key_pad, lab_pad


def _relax_kernel(
    active_ref,
    v_hbm,
    key_in,
    lab_in,
    key_out,
    lab_out,
    flags_ref,
    chg_ref,
    sat_ref,
    *rest,
    tile,
    steps,
    pipelined,
    ctr_cols=None,
    fused_scan=None,
    scan_stats_only=False,
):
    if fused_scan is None:
        v2, key2, lab2, sems = rest
        y_out = yst = ycarry = mstats_ref = None
    elif scan_stats_only:
        # Stats-only epilogue (VERDICT r3 #1): the single-component shortcut
        # scalars WITHOUT the fwd-scan y plane — no staging scratch, no
        # carry, no y DMA.  Footprint == the segmenting kernel's, so the
        # merging path keeps the segmenting tile table (8192²: 152 vs the
        # fused 144); the scan tail recomputes pass 1 itself when the
        # shortcut does not fire (component_min_from_padded y0=None).
        mstats_ref, v2, key2, lab2, sems = rest
        y_out = yst = ycarry = None
    else:
        y_out, mstats_ref, v2, key2, lab2, yst, ycarry, sems = rest
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
    sat_ref[i, 0] = 0
    if fused_scan is not None:
        # Neutral defaults (inactive bands never reach the epilogue).
        mstats_ref[i, 0] = 0
        mstats_ref[i, 1] = 0
        mstats_ref[i, 2] = jnp.int32(_SCAN_INF)

    # Window DMAs.  The key/label windows are split into a TOP-HALO region
    # (p rows — the only rows band i-1's in-place centre write overlaps) and
    # the rest, so the pipelined mode can order predecessor-write-after-
    # successor-prefetch on exactly the overlapping region.
    # sems: 0=v, 1=key_top, 2=key_rest, 3=lab_top, 4=lab_rest, 5/6=out.
    def dma_v(s, band):
        row0 = band * t
        return pltpu.make_async_copy(
            v_hbm.at[pl.ds(row0, win), :], v2.at[s], sems.at[s, 0]
        )

    def dma_tops(s, band):
        row0 = band * t
        return (
            pltpu.make_async_copy(
                key_in.at[pl.ds(row0, p), :], key2.at[s, pl.ds(0, p), :],
                sems.at[s, 1],
            ),
            pltpu.make_async_copy(
                lab_in.at[pl.ds(row0, p), :], lab2.at[s, pl.ds(0, p), :],
                sems.at[s, 3],
            ),
        )

    def dma_rests(s, band):
        row0 = band * t
        return (
            pltpu.make_async_copy(
                key_in.at[pl.ds(row0 + p, t + p), :],
                key2.at[s, pl.ds(p, t + p), :],
                sems.at[s, 2],
            ),
            pltpu.make_async_copy(
                lab_in.at[pl.ds(row0 + p, t + p), :],
                lab2.at[s, pl.ds(p, t + p), :],
                sems.at[s, 4],
            ),
        )

    def start_all(s, band):
        dma_v(s, band).start()
        for dma in dma_tops(s, band):
            dma.start()
        for dma in dma_rests(s, band):
            dma.start()

    def compute_and_write():
        # All candidate math runs on PACKED keys, branch-free:
        #   cand(q) = max(ext, vcand)  with vcand = min(vkey + 1, UNCLAIMED)
        #   and the saturating increment ext = min(kq + 1, kq | D_MASK)
        # is EXACTLY the lexicographic extend-or-restart:
        #   d(q) < 2^23-1: ext = kq+1 (same level, d+1 <= D_MASK), and
        #     kq >= vkey (neighbour level >= v)  =>  kq+1 >= vkey+1 = vcand,
        #       so max picks kq+1 = (L(q), d(q)+1)    — extend;
        #     kq <  vkey                        =>  kq+1 <= vkey < vcand,
        #       so max picks vcand = (v, 1)           — restart.
        #   d(q) == 2^23-1: kq+1 would CARRY into the level field; ext
        #     saturates to kq itself (kq | D_MASK == kq), so monster-plateau
        #     rings pin at (L, 2^23-1) instead of corrupting the level — see
        #     the module docstring for the degradation semantics.
        # Unclaimed neighbours (kq = 255<<23, d=0) give ext = (255<<23)+1,
        # which can never beat any pixel's current key (<= 255<<23) — so
        # aprons / NEVER_FILL pixels never donate; restarts at v >= 255 are
        # rejected by vcand's min-clamp; nothing overflows (max key+1 < 2^31).
        vkey = jax.lax.shift_left(v2[slot].astype(jnp.int32) + 128, _D_BITS)
        vcand = jnp.minimum(vkey + 1, jnp.int32(_UNCLAIMED))
        key0 = key2[slot]
        lab0 = lab2[slot]
        wp = key0.shape[1]
        biglab = jnp.int32(2**30)

        # Centre-column mask for CHANGE DETECTION only (tiled/shard_map use:
        # halo and lane-padding columns evolve every call — their state is
        # discarded and re-exchanged each round, so counting them would block
        # convergence forever).  The `rest`-loop gate stays UNMASKED: a
        # halo-only change in sweep j can reach the centre in sweep j+1.
        # Centre weight plane for the fused change reduction (see one_sweep):
        # 2 on centre rows (and, in tiled use, centre columns), 1 elsewhere —
        # ONE max-reduction then yields both "any window change" (> 0) and
        # "any centre change" (> 1) instead of two separate reductions.
        rows_w = jax.lax.broadcasted_iota(jnp.int32, (win, wp), 0)
        centre = (rows_w >= p) & (rows_w < p + t)
        if ctr_cols is not None:
            lo, hi = ctr_cols
            cols_w = jax.lax.broadcasted_iota(jnp.int32, (win, wp), 1)
            centre = centre & (cols_w >= lo) & (cols_w < hi)
        chg_weight = jnp.where(centre, jnp.int32(2), jnp.int32(1))

        def rolls(a):
            return (
                pltpu.roll(a, 1, 0),
                pltpu.roll(a, win - 1, 0),
                pltpu.roll(a, 1, 1),
                pltpu.roll(a, wp - 1, 1),
            )

        def one_sweep(key, lab):
            kq4 = rolls(key)
            lq4 = rolls(lab)
            # Two min-reduction factorings (bit-identical integer math):
            # * ext(a) = min(a+1, a | D_MASK) is MONOTONE in the packed key
            #   (a+1 is; a | D_MASK pins d at the field max so it orders by
            #   the level bits alone, which are monotone in a; min of
            #   monotones is monotone), so min_d ext(kq_d) = ext(min_d kq_d)
            #   — ONE saturating extend of the 4-neighbour min instead of
            #   four;
            # * max(., vcand) is monotone, so the min-reduction commutes
            #   through it — one max per sweep instead of four.
            kmin = jnp.minimum(
                jnp.minimum(kq4[0], kq4[1]), jnp.minimum(kq4[2], kq4[3])
            )
            ext_min = jnp.minimum(kmin + 1, kmin | jnp.int32(_D_MASK))
            best = jnp.minimum(key, jnp.maximum(ext_min, vcand))
            labmin = None
            for kq, lq in zip(kq4, lq4):
                cand = jnp.where(kq < best, lq, biglab)
                labmin = cand if labmin is None else jnp.minimum(labmin, cand)
            # Gate on claimed-ness: an UNCLAIMED pixel (best == sentinel —
            # e.g. NEVER_FILL / border / apron) must keep lab = 0 instead of
            # soaking up neighbour labels it can never use.  Donating
            # neighbours (kq < best) are claimed, so claimed pixels' label
            # propagation is untouched — final labels are bit-identical, and
            # the invariant "lab plane == final label image" lets the driver
            # skip the whole where(claim <= max) extraction pass at the
            # default max water level.
            new_lab = jnp.where(
                (labmin == biglab) | (best == jnp.int32(_UNCLAIMED)), lab, labmin
            )
            # Fused change reduction: one weighted max instead of two anys
            # (the window/centre flags decode from > 0 / > 1 — chg_weight is
            # 2 exactly on the centre region).
            chg = (best != key) | (new_lab != lab)
            m = jnp.max(jnp.where(chg, chg_weight, jnp.int32(0)))
            return best, new_lab, m > 0, m > 1

        key1, lab1, chg1_win, chg1_ctr = one_sweep(key0, lab0)

        def rest(args):
            k1, l1, c1 = args

            # Early exit: once a sweep changes NOTHING in the window, every
            # remaining sweep is the identity, so stopping is bit-identical
            # to the full unroll — and the carried centre-change of the last
            # executed sweep equals that of the (virtual) final sweep, so
            # the convergence witness is unaffected.  On near-converged
            # calls (everything after the first dense call) this cuts most
            # of the VPU work.
            def cond(carry):
                i, _, _, _, cw, _ = carry
                return (i < steps - 1) & cw

            def body(carry):
                i, key, lab, anyc, _, _ = carry
                k2, l2, cw2, cc2 = one_sweep(key, lab)
                return i + 1, k2, l2, anyc | cc2, cw2, cc2

            _, key, lab, anyc, _, cc = jax.lax.while_loop(
                cond, body, (jnp.int32(0), k1, l1, c1, jnp.bool_(True), c1)
            )
            return key, lab, anyc, cc

        fkey, flab, any_ctr, last_ctr = jax.lax.cond(
            chg1_win,
            rest,
            lambda args: (args[0], args[1], args[2], args[2]),
            (key1, lab1, chg1_ctr),
        )

        flags_ref[i, 0] = any_ctr.astype(jnp.int32)
        # d-field saturation detector (VERDICT r2 #4): at the global fixed
        # point, a CLAIMED pixel with label 0 exists iff label donation was
        # starved by equal (saturated) adjacent keys — claims complete at the
        # pinned (L, 2^23-1) key but donation needs a STRICTLY smaller
        # neighbour key (see the module docstring's degradation semantics).
        # Any other claimed pixel has a donor with a strictly smaller key at
        # the fixed point (ext adds 1 unless saturated; restarts donate from
        # below the restart level), so its label is nonzero.  Computed once
        # per band per call over the centre region (halo transients from the
        # split key/lab write DMAs excluded) — VPU-only, ~1/steps of one
        # sweep's cost.  Only the value from a band's LAST computed call is
        # meaningful (the driver masks by the active set); mid-relaxation
        # claimed-but-unlabelled states are expected and harmless.
        # Computed on CENTRE-ROW SLICES, not window-sized masks: (t, wp)
        # slices shrink the detector's mask temporaries by the halo share
        # and drop the row-iota term (measured ~0.01 MiB of scoped VMEM at
        # 8192² — small, but this kernel lives at the VMEM ceiling; see
        # the _WIN_ELEM_BYTES_X10 recalibration note).
        fk_c = fkey[p : p + t, :]
        fl_c = flab[p : p + t, :]
        sat_m = (fk_c < jnp.int32(_UNCLAIMED)) & (fl_c == 0)
        if ctr_cols is not None:
            cols_c = jax.lax.broadcasted_iota(jnp.int32, (t, fk_c.shape[1]), 1)
            sat_m = sat_m & (cols_c >= ctr_cols[0]) & (cols_c < ctr_cols[1])
        sat_ref[i, 0] = jnp.max(sat_m.astype(jnp.int32))
        # Convergence witness — mode-dependent soundness argument:
        # * pipelined: every band's reads are EXACTLY the call-start state
        #   (successor prefetch completion is ordered before the in-place
        #   write; see below), i.e. the call is a true global Jacobi block,
        #   so "last sweep quiescent in every band" certifies the fixed
        #   point (centres at internal steps P-1 and P equal the global
        #   sweeps G_{P-1} and G_P — ops/pallas_flood.py's argument).
        # * sparse: active bands read each other Gauss-Seidel-style, so the
        #   certificate must be "NO band wrote anything this call".
        witness = last_ctr if pipelined else any_ctr
        chg_ref[0, 0] = jnp.maximum(chg_ref[0, 0], witness.astype(jnp.int32))

        # In-place write of the changed centre rows only.
        @pl.when(any_ctr)
        def _():
            row0 = i * t
            key2[slot, p : p + t, :] = fkey[p : p + t, :]
            lab2[slot, p : p + t, :] = flab[p : p + t, :]
            co1 = pltpu.make_async_copy(
                key2.at[slot, pl.ds(p, t), :],
                key_out.at[pl.ds(row0 + p, t), :],
                sems.at[slot, 5],
            )
            co2 = pltpu.make_async_copy(
                lab2.at[slot, pl.ds(p, t), :],
                lab_out.at[pl.ds(row0 + p, t), :],
                sems.at[slot, 6],
            )
            co1.start()
            co2.start()
            co1.wait()
            co2.wait()

        # Fused fwd-vertical segmented-min scan epilogue (merging path):
        # when this call converges, flab's centre rows ARE the final label
        # plane, and the grid's top-to-bottom band order is exactly the
        # cross-band carry order the component-min fwd pass needs
        # (ops.scan_merge._fwd_v_kernel) — so the scan's first pass rides
        # this kernel for free and the separate fwd read of the lab plane
        # disappears.  Only sound when EVERY band computes (the driver
        # passes active=ones and pipelined=True); the driver discards y_out
        # unless this call's witness certified convergence.
        if fused_scan is not None:
            col_lo, col_hi, real_h = fused_scan
            x = flab[p : p + t, :]
            wps = x.shape[1]
            rr = jax.lax.broadcasted_iota(jnp.int32, (t, wps), 0)
            ccs = jax.lax.broadcasted_iota(jnp.int32, (t, wps), 1)
            inf = jnp.int32(_SCAN_INF)
            co = None
            if not scan_stats_only:
                reset = x == 0
                sv, sb = _seg_min_scan(
                    jnp.where(reset, inf, x), reset.astype(jnp.int32), 0, t,
                    False, rr
                )
                carry_in = jnp.where(
                    i == 0, jnp.full((1, wps), inf, jnp.int32), ycarry[...]
                )
                sfinal = jnp.where(sb != 0, sv, jnp.minimum(sv, carry_in))
                ycarry[...] = jnp.min(
                    jnp.where(rr == t - 1, sfinal, inf), axis=0, keepdims=True
                )
                y = jnp.where(reset, 0, sfinal)
                y = jnp.where((ccs == col_lo) | (ccs == col_hi), x, y)
                yst[...] = y
                co = pltpu.make_async_copy(
                    yst, y_out.at[pl.ds(i * t, t), :], sems.at[slot, 7]
                )
                co.start()
            # Single-component shortcut statistics (ops.level_driver): when
            # the fixed point has NO unclaimed interior pixel and NO claimed
            # border pixel, the claimed set is the full interior rectangle —
            # ONE 4-connected component — so component-min is a broadcast of
            # the global minimum label and the whole scan tail is skipped.
            # Three per-band scalars over data already in registers:
            #   [0] COUNT of unclaimed interior pixels (0 = no component
            #       splitter; the batched stacked plane compares the count
            #       against its known structural NEVER_FILL cell count —
            #       see level_driver's per-image broadcast shortcut),
            #   [1] any claimed border pixel (border cells merge h-only —
            #       quirk semantics the broadcast cannot reproduce),
            #   [2] min claimed interior label.
            # Valid under exactly y0's condition (this call certified).
            # The count is exact: bands partition the output rows and the
            # 1-D band kernel has no column halos, so every (row, col)
            # interior cell is summed exactly once.
            grow = rr + i * t
            claimed = x != 0
            interior = (
                (grow >= 1)
                & (grow <= real_h - 2)
                & (ccs > col_lo)
                & (ccs < col_hi)
            )
            border = (
                (grow == 0)
                | (grow == real_h - 1)
                | (ccs == col_lo)
                | (ccs == col_hi)
            )
            mstats_ref[i, 0] = jnp.sum(
                (interior & jnp.logical_not(claimed)).astype(jnp.int32)
            )
            mstats_ref[i, 1] = jnp.max((border & claimed).astype(jnp.int32))
            mstats_ref[i, 2] = jnp.min(jnp.where(interior & claimed, x, inf))
            if co is not None:
                co.wait()

    if pipelined:
        # Dense mode: UNCONDITIONAL cross-band DMA pipelining (band i+1's
        # window prefetches during band i's compute) with Jacobi-consistent
        # reads: band i's in-place centre write overlaps ONLY band i+1's
        # top-halo region (requires tile >= steps), and that region's
        # prefetch is waited below BEFORE band i may write — so every band
        # reads the call-start state.  Band i's own top halo was waited by
        # band i-1 for the same reason (band 0 waits it itself).  All
        # issue/wait pairs are static — conditional cross-step pairing
        # deadlocks the DMA engine (see ops/pallas_flood.py).
        @pl.when(i == 0)
        def _():
            start_all(slot, i)

        @pl.when(i + 1 < gy)
        def _():
            start_all(nslot, i + 1)

        dma_v(slot, i).wait()
        for dma in dma_rests(slot, i):
            dma.wait()

        @pl.when(i == 0)
        def _():
            for dma in dma_tops(slot, i):
                dma.wait()

        @pl.when(i + 1 < gy)
        def _():
            # Successor's top halo (= the tail of OUR centre) must be safely
            # in VMEM before our in-place write; band i+1 does not re-wait.
            for dma in dma_tops(nslot, i + 1):
                dma.wait()

        @pl.when(active_ref[i] > 0)
        def _():
            compute_and_write()
    else:
        # Sparse mode: only active bands touch HBM at all.
        @pl.when(active_ref[i] > 0)
        def _():
            start_all(slot, i)
            dma_v(slot, i).wait()
            for dma in dma_tops(slot, i):
                dma.wait()
            for dma in dma_rests(slot, i):
                dma.wait()
            compute_and_write()


def relax_block(
    v_pad,
    key_pad,
    lab_pad,
    active,
    *,
    tile=DEFAULT_TILE,
    steps=DEFAULT_STEPS,
    interpret=False,
    pipelined=True,
    ctr_cols=None,
    fused_scan=None,
    scan_stats_only=False,
):
    """P fused relaxation sweeps over the active bands (in-place aliased).

    Returns (key', lab', flags, not_converged, sat): flags[i] != 0 iff band
    i's centre changed; not_converged == False certifies the global fixed
    point; sat[i] != 0 iff band i's centre holds a claimed pixel with label
    0 — the d-field saturation signature AT the fixed point (meaningful only
    for bands that computed this call; mid-relaxation it is transient).
    ``ctr_cols=(lo, hi)`` restricts change DETECTION to a static column range
    (tiled/shard_map use — see the kernel comment); the sweeps themselves
    always run full-width.

    ``fused_scan=(col_lo, col_hi, real_h)`` additionally emits the
    forward-vertical segmented-min scan of the final label plane (the
    merging component-min pass 1, ops.scan_merge) as a result y of shape
    (hp - 2*steps, wp), plus per-band single-component statistics mstats
    (gy, 3) — see the kernel epilogue comment — BOTH valid ONLY when this
    call certified convergence (not_converged == False).  Requires
    pipelined=True and an all-active band set: the scan's cross-band carry
    needs every band to compute, in grid order.

    ``scan_stats_only=True`` (with fused_scan) emits ONLY the mstats output
    — no y plane, no staging scratch, segmenting-kernel footprint — for the
    production merging path whose scan tail recomputes pass 1 itself when
    the single-component shortcut does not fire (VERDICT r3 #1).
    """
    if tile < steps:
        raise ValueError(
            f"relax_block needs tile >= steps (got {tile} < {steps}): the "
            "pipelined write-ordering covers exactly the successor's top halo"
        )
    if fused_scan is not None and not pipelined:
        raise ValueError(
            "fused_scan needs pipelined=True (dense all-active call): the "
            "scan carry requires every band to compute in grid order"
        )
    hp, wp = v_pad.shape
    p = steps
    gy = (hp - 2 * p) // tile
    win = tile + 2 * p

    out_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec((gy, 1), lambda i, *_: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1), lambda i, *_: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((gy, 1), lambda i, *_: (0, 0), memory_space=pltpu.SMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((hp, wp), jnp.int32),
        jax.ShapeDtypeStruct((hp, wp), jnp.int32),
        jax.ShapeDtypeStruct((gy, 1), jnp.int32),
        jax.ShapeDtypeStruct((1, 1), jnp.int32),
        jax.ShapeDtypeStruct((gy, 1), jnp.int32),
    ]
    scratch = [
        pltpu.VMEM((2, win, wp), jnp.int8),
        pltpu.VMEM((2, win, wp), jnp.int32),
        pltpu.VMEM((2, win, wp), jnp.int32),
    ]
    if fused_scan is not None:
        if not scan_stats_only:
            out_specs.append(pl.BlockSpec(memory_space=pl.ANY))
            out_shape.append(
                jax.ShapeDtypeStruct((gy * tile, wp), jnp.int32)
            )
        out_specs.append(
            pl.BlockSpec((gy, 3), lambda i, *_: (0, 0), memory_space=pltpu.SMEM)
        )
        out_shape.append(jax.ShapeDtypeStruct((gy, 3), jnp.int32))
        if not scan_stats_only:
            scratch += [
                pltpu.VMEM((tile, wp), jnp.int32),
                pltpu.VMEM((1, wp), jnp.int32),
            ]
    scratch.append(
        pltpu.SemaphoreType.DMA(
            (2, 8 if (fused_scan and not scan_stats_only) else 7)
        )
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(gy,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=out_specs,
        scratch_shapes=scratch,
    )

    active = jnp.asarray(active, dtype=jnp.int32)
    outs = pl.pallas_call(
        partial(
            _relax_kernel,
            tile=tile,
            steps=steps,
            pipelined=pipelined,
            ctr_cols=ctr_cols,
            fused_scan=fused_scan,
            scan_stats_only=scan_stats_only,
        ),
        grid_spec=grid_spec,
        out_shape=out_shape,
        input_output_aliases={2: 0, 3: 1},
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT_BYTES),
        interpret=interpret,
    )(active, v_pad, key_pad, lab_pad)
    key2, lab2, flags, chg, sat = outs[:5]
    base = (key2, lab2, flags[:, 0], chg[0, 0] > 0, sat[:, 0])
    if fused_scan is None:
        return base
    if scan_stats_only:
        return base + (outs[5],)  # (..., mstats)
    return base + (outs[5], outs[6])  # (..., y, mstats)


_STRIPE_HALO = 128  # lane-dim halo per stripe side (DMA lane granularity)

# Auto-resolved stripe widths aim near this lane count: wide enough to keep
# lane-halo redundancy low (256/cw), narrow enough that the VMEM-capped band
# height stays tall (row redundancy 2p/tile).  Hardware-measured at 8192²
# (see ops.tune.STRIPE_TABLE).
_STRIPE_TARGET_CW = 4096
# Auto-tile cap for the column-blocked kernel (taller windows than the 1-D
# kernel's DEFAULT_TILE are the point of striping; measured table entries
# may exceed this).
_STRIPE_TILE_CAP = 512


def vmem_model_bytes2d(
    cw: int, steps: int, tile: int, fused_scan: bool = False
) -> int:
    """vmem_model_bytes for the column-blocked kernel: identical per-window
    structure (same scratch layout, same sweep body), so the calibrated
    _WIN_ELEM_BYTES_X10 applies with the stripe window width cw + 2·halo in
    place of the full padded width."""
    cwin = cw + 2 * _STRIPE_HALO
    b = (tile + 2 * steps) * cwin * _WIN_ELEM_BYTES_X10 // 10
    if fused_scan:
        b += 4 * tile * cwin
    return b


def _stripe_auto_tile(cw: int, steps: int, fused_scan: bool = False) -> int:
    """Largest 8-multiple band height fitting the stripe window in VMEM
    (same budget discipline as auto_tile), capped at _STRIPE_TILE_CAP."""
    cwin = cw + 2 * _STRIPE_HALO
    per10 = cwin * _WIN_ELEM_BYTES_X10
    extra10 = 40 * cwin if fused_scan else 0
    tile = (
        ((vmem_budget() - _AUTO_TILE_SLACK) * 10 - 2 * steps * per10)
        // (per10 + extra10)
        // 8
        * 8
    )
    return int(max(8, min(_STRIPE_TILE_CAP, tile)))


def resolve_stripe_config(
    h: int, w: int, *, steps=None, tile=None, fwd_scan: bool = False
):
    """Decide whether the column-blocked (2-D grid) kernel should run this
    geometry, and with what schedule.

    Returns ``(steps, tile, nx, cw)`` when striping wins, else ``None``
    (the full-width 1-D band path).  The decision compares the MODELED sweep
    redundancy R = (window area) / (useful centre area):

    * 1-D: R₁ = (tile₁ + 2p)/tile₁ · wp/w   (tile₁ from resolve_relax_config
      — the VMEM wall caps it at wide images: 152 rows at 8192, R₁ ≈ 1.47);
    * 2-D: R₂ = (tile₂ + 2p)/tile₂ · nx·(cw + 2·128)/w  (column stripes
      restore tall bands at the cost of a 256-lane halo per stripe).

    Striping engages iff the best stripe candidate beats the 1-D band —
    which the model first predicts at w ≈ 6k and measures true at 8192²
    (BENCHMARKS.md r8) — or the 1-D resolution raises (image too wide for
    even a minimum-height full-width band), which striping removes as a
    geometry limit.  ``RWT_RELAX_STRIPES="nx,cw"`` forces a configuration
    (perf sweeps); ``RWT_RELAX_STRIPES="0"`` disables striping.
    """
    import os as _os

    from .tune import STRIPE_TABLE, relax_steps

    # 'stats' (stats-only fused epilogue) has the segmenting footprint:
    # only the full fused scan (True) stages a y plane in VMEM.
    fwd_scan = fwd_scan is True
    steps_in = steps
    if steps is None:
        steps = relax_steps(w)
        if h > 2 * w:
            steps = max(steps, 32)
    if steps > _STRIPE_HALO:
        return None  # lane halo must cover the sweep count (witness range)

    def clamp_tile(t):
        return max(8, min(t, -(-h // 8) * 8))

    env = _os.environ.get("RWT_RELAX_STRIPES")
    if env is not None:
        if env.strip() in ("", "0", "off"):
            return None
        nx, cw = (int(x) for x in env.replace(":", ",").split(","))
        t = tile if tile is not None else clamp_tile(
            _stripe_auto_tile(cw, steps, fwd_scan)
        )
        return steps, t, nx, cw

    if w in STRIPE_TABLE:
        nx, cw, t_meas = STRIPE_TABLE[w]
        t = tile if tile is not None else clamp_tile(t_meas)
        if tile is None:
            # Drift resilience: a measured tile steps down the 8-multiple
            # schedule when the session's derated budget no longer fits it
            # (same discipline as resolve_relax_config's table shrink).
            while t > 8 and vmem_model_bytes2d(cw, steps, t, fwd_scan) > vmem_budget():
                t -= 8
        return steps, t, nx, cw

    # Modeled decision for unmeasured widths.
    try:
        s1, tile1 = resolve_relax_config(
            h, w, steps=steps_in, tile=tile, fwd_scan=fwd_scan
        )
        wp1 = -(-(w + 2 * s1) // 128) * 128
        r1 = (tile1 + 2 * s1) / tile1 * wp1 / w
    except ValueError:
        r1 = float("inf")  # too wide for any full-width band

    best = None
    for target in (_STRIPE_TARGET_CW, _STRIPE_TARGET_CW // 2):
        nx = max(2, -(-w // target))
        cw = -(-(-(-w // nx)) // 128) * 128
        t = tile if tile is not None else clamp_tile(
            _stripe_auto_tile(cw, steps, fwd_scan)
        )
        if t < 8 or vmem_model_bytes2d(cw, steps, t, fwd_scan) > vmem_budget():
            continue
        r2 = (t + 2 * steps) / t * nx * (cw + 2 * _STRIPE_HALO) / w
        if best is None or r2 < best[0]:
            best = (r2, t, nx, cw)
    if best is None or best[0] >= r1:
        return None
    return steps, best[1], best[2], best[3]


def _relax_kernel2d(
    v_hbm,
    key_in,
    lab_in,
    _key_dst,
    _lab_dst,
    key_out,
    lab_out,
    flags_ref,
    chg_ref,
    sat_ref,
    *rest,
    tile,
    steps,
    cw,
    fused_scan=None,
    scan_stats_only=False,
):
    """Column-blocked (2-D grid) relaxation kernel — donated PING-PONG planes.

    Grid (nx, gy), band index fastest: program (cb, i) sweeps the window
    rows [i·t, i·t + t + 2p) × lanes [cb·cw, cb·cw + cw + 2·128) of the
    padded planes.  Reads come exclusively from the call-start planes
    (key_in / lab_in are never written), so the call is a true global
    Jacobi block REGARDLESS of program order — the "last sweep quiescent in
    every window" witness is sound with no write-after-prefetch ordering at
    all (contrast _relax_kernel's in-place pipelined mode; the soundness
    argument is ops/pallas_flood.py's: with row halo p = steps and lane halo
    128 >= steps, a window's centre after its j-th internal sweep equals
    global Jacobi sweep G_j there, so centre-quiescence of the last sweep in
    every window certifies the global fixed point).

    Outputs ride DONATED ping-pong buffers (input_output_aliases on
    _key_dst/_lab_dst, never read): every program writes its centre-rows ×
    centre-lanes region ONLY, so the constant aprons the donated buffer
    already carries (pack-time values) are never touched.  This is what
    makes the call safe against wrap-roll ghost corruption: post-sweep halo
    lanes/rows of a window are corrupted up to `steps` cells inward from the
    window edge and are simply never written anywhere.

    This kernel exists for images too wide for a full-width band at a
    useful tile (the VMEM wall at >= ~6k lanes, resolve_stripe_config): nx
    column stripes of ~4096 lanes restore tall bands, cutting the window
    redundancy from ~1.47x to ~1.26x at 8192².  There is no band activity
    gating — the schedule (steps >= the max claim chain) converges and
    certifies in ONE call on non-adversarial inputs, and rare extra calls
    run dense.
    """
    if fused_scan is None:
        v2, key2, lab2, sems = rest
        y_out = yst = ycarry = mstats_ref = None
    elif scan_stats_only:
        # Stats-only epilogue — see _relax_kernel (same trade, per stripe).
        mstats_ref, v2, key2, lab2, sems = rest
        y_out = yst = ycarry = None
    else:
        y_out, mstats_ref, v2, key2, lab2, yst, ycarry, sems = rest
    t, p = tile, steps
    win = t + 2 * p
    hs = _STRIPE_HALO
    cwin = cw + 2 * hs
    cb = pl.program_id(0)
    i = pl.program_id(1)
    nx = pl.num_programs(0)
    gy = pl.num_programs(1)
    gidx = cb * gy + i
    slot = jax.lax.rem(gidx, 2)
    nslot = 1 - slot

    @pl.when(gidx == 0)
    def _():
        chg_ref[0, 0] = 0

    def dma_all(s, c, b):
        row0 = b * t
        col0 = c * cw
        return tuple(
            pltpu.make_async_copy(
                src.at[pl.ds(row0, win), pl.ds(col0, cwin)],
                dst.at[s],
                sems.at[s, k],
            )
            for src, dst, k in (
                (v_hbm, v2, 0),
                (key_in, key2, 1),
                (lab_in, lab2, 2),
            )
        )

    @pl.when(gidx == 0)
    def _():
        for d in dma_all(slot, 0, 0):
            d.start()

    @pl.when(gidx + 1 < nx * gy)
    def _():
        nc = jnp.where(i + 1 < gy, cb, cb + 1)
        nb = jnp.where(i + 1 < gy, i + 1, 0)
        for d in dma_all(nslot, nc, nb):
            d.start()

    for d in dma_all(slot, cb, i):
        d.wait()

    # --- the sweep body (identical math to _relax_kernel's one_sweep) ---
    vkey = jax.lax.shift_left(v2[slot].astype(jnp.int32) + 128, _D_BITS)
    vcand = jnp.minimum(vkey + 1, jnp.int32(_UNCLAIMED))
    key0 = key2[slot]
    lab0 = lab2[slot]
    biglab = jnp.int32(2**30)

    rows_w = jax.lax.broadcasted_iota(jnp.int32, (win, cwin), 0)
    cols_w = jax.lax.broadcasted_iota(jnp.int32, (win, cwin), 1)
    centre = (
        (rows_w >= p) & (rows_w < p + t) & (cols_w >= hs) & (cols_w < hs + cw)
    )
    chg_weight = jnp.where(centre, jnp.int32(2), jnp.int32(1))

    def rolls(a):
        return (
            pltpu.roll(a, 1, 0),
            pltpu.roll(a, win - 1, 0),
            pltpu.roll(a, 1, 1),
            pltpu.roll(a, cwin - 1, 1),
        )

    def one_sweep(key, lab):
        kq4 = rolls(key)
        lq4 = rolls(lab)
        kmin = jnp.minimum(
            jnp.minimum(kq4[0], kq4[1]), jnp.minimum(kq4[2], kq4[3])
        )
        ext_min = jnp.minimum(kmin + 1, kmin | jnp.int32(_D_MASK))
        best = jnp.minimum(key, jnp.maximum(ext_min, vcand))
        labmin = None
        for kq, lq in zip(kq4, lq4):
            cand = jnp.where(kq < best, lq, biglab)
            labmin = cand if labmin is None else jnp.minimum(labmin, cand)
        new_lab = jnp.where(
            (labmin == biglab) | (best == jnp.int32(_UNCLAIMED)), lab, labmin
        )
        chg = (best != key) | (new_lab != lab)
        m = jnp.max(jnp.where(chg, chg_weight, jnp.int32(0)))
        return best, new_lab, m > 0, m > 1

    key1, lab1, chg1_win, chg1_ctr = one_sweep(key0, lab0)

    def rest_loop(args):
        k1, l1, c1 = args

        # Early exit (bit-identical — see _relax_kernel's rest loop).
        def cond(carry):
            j, _, _, _, cw_, _ = carry
            return (j < steps - 1) & cw_

        def body(carry):
            j, key, lab, anyc, _, _ = carry
            k2, l2, cw2, cc2 = one_sweep(key, lab)
            return j + 1, k2, l2, anyc | cc2, cw2, cc2

        _, key, lab, anyc, _, cc = jax.lax.while_loop(
            cond, body, (jnp.int32(0), k1, l1, c1, jnp.bool_(True), c1)
        )
        return key, lab, anyc, cc

    fkey, flab, any_ctr, last_ctr = jax.lax.cond(
        chg1_win,
        rest_loop,
        lambda args: (args[0], args[1], args[2], args[2]),
        (key1, lab1, chg1_ctr),
    )

    flags_ref[gidx, 0] = any_ctr.astype(jnp.int32)
    # Saturation detector on the centre region (see _relax_kernel).
    fk_c = fkey[p : p + t, :]
    fl_c = flab[p : p + t, :]
    cols_c = jax.lax.broadcasted_iota(jnp.int32, (t, cwin), 1)
    ctr_c = (cols_c >= hs) & (cols_c < hs + cw)
    sat_ref[gidx, 0] = jnp.max(
        ((fk_c < jnp.int32(_UNCLAIMED)) & (fl_c == 0) & ctr_c).astype(
            jnp.int32
        )
    )
    # Jacobi block: the last executed sweep's centre-quiescence in every
    # window IS the global-sweep witness (see the docstring).
    chg_ref[0, 0] = jnp.maximum(chg_ref[0, 0], last_ctr.astype(jnp.int32))

    # Stage the centre region into the window scratch (centre LANES only —
    # post-sweep halo lanes hold wrap-roll ghosts and must never leave the
    # window) and emit it to the donated output planes.
    key2[slot, p : p + t, hs : hs + cw] = fkey[p : p + t, hs : hs + cw]
    lab2[slot, p : p + t, hs : hs + cw] = flab[p : p + t, hs : hs + cw]
    row0 = i * t + p
    col0c = cb * cw + hs
    co1 = pltpu.make_async_copy(
        key2.at[slot, pl.ds(p, t), pl.ds(hs, cw)],
        key_out.at[pl.ds(row0, t), pl.ds(col0c, cw)],
        sems.at[slot, 3],
    )
    co2 = pltpu.make_async_copy(
        lab2.at[slot, pl.ds(p, t), pl.ds(hs, cw)],
        lab_out.at[pl.ds(row0, t), pl.ds(col0c, cw)],
        sems.at[slot, 4],
    )
    co1.start()
    co2.start()
    co1.wait()
    co2.wait()

    # Fused fwd-vertical segmented-min scan epilogue (merging path): per
    # stripe, top-to-bottom — exactly the grid order (band index fastest).
    # The scan input is flab MASKED to the centre lanes: halo lanes carry
    # post-sweep ghosts, and the y plane's pad lanes must be genuine zero
    # barriers or the tail's violation stencil could loop forever.
    if fused_scan is not None:
        col_lo, col_hi, real_h = fused_scan
        col0 = cb * cw
        lane_w = jax.lax.broadcasted_iota(jnp.int32, (t, cwin), 1)
        centre_l = (lane_w >= hs) & (lane_w < hs + cw)
        x = jnp.where(centre_l, flab[p : p + t, :], 0)
        rr = jax.lax.broadcasted_iota(jnp.int32, (t, cwin), 0)
        ccs = lane_w + col0
        inf = jnp.int32(_SCAN_INF)
        if not scan_stats_only:
            reset = x == 0
            sv, sb = _seg_min_scan(
                jnp.where(reset, inf, x), reset.astype(jnp.int32), 0, t,
                False, rr
            )
            carry_in = jnp.where(
                i == 0, jnp.full((1, cwin), inf, jnp.int32), ycarry[...]
            )
            sfinal = jnp.where(sb != 0, sv, jnp.minimum(sv, carry_in))
            ycarry[...] = jnp.min(
                jnp.where(rr == t - 1, sfinal, inf), axis=0, keepdims=True
            )
            y = jnp.where(reset, 0, sfinal)
            y = jnp.where((ccs == col_lo) | (ccs == col_hi), x, y)
            yst[...] = y

        # Single-component shortcut statistics (see _relax_kernel's fused
        # epilogue).  The interior-unclaimed flag additionally masks to the
        # CENTRE lanes: x is zeroed on halo lanes, which would otherwise
        # false-trigger; claimed-border and the min are immune (x != 0
        # implies a centre lane).
        grow = rr + i * t
        claimed = x != 0
        interior = (
            (grow >= 1)
            & (grow <= real_h - 2)
            & (ccs > col_lo)
            & (ccs < col_hi)
        )
        border = (
            (grow == 0)
            | (grow == real_h - 1)
            | (ccs == col_lo)
            | (ccs == col_hi)
        )
        # [0] is a COUNT (see _relax_kernel's epilogue); the centre-lane mask
        # keeps it exact across stripes: each global cell is a centre lane of
        # exactly one stripe, so the per-band sums partition the interior.
        mstats_ref[gidx, 0] = jnp.sum(
            (interior & centre_l & jnp.logical_not(claimed)).astype(jnp.int32)
        )
        mstats_ref[gidx, 1] = jnp.max((border & claimed).astype(jnp.int32))
        mstats_ref[gidx, 2] = jnp.min(jnp.where(interior & claimed, x, inf))

        if not scan_stats_only:

            def emit_y(cw0, cws):
                co = pltpu.make_async_copy(
                    yst.at[pl.ds(0, t), pl.ds(cw0, cws)],
                    y_out.at[pl.ds(i * t, t), pl.ds(col0 + cw0, cws)],
                    sems.at[slot, 5],
                )
                co.start()
                co.wait()

            emit_y(hs, cw)  # centre lanes — every program

            # Pad lanes of the y plane (zeros via the centre mask): written
            # by the edge stripes so the plane is complete for the scan
            # tail.
            @pl.when(cb == 0)
            def _():
                emit_y(0, hs)

            @pl.when(cb == nx - 1)
            def _():
                emit_y(hs + cw, hs)


def relax_block2d(
    v_pad,
    key_in,
    lab_in,
    key_dst,
    lab_dst,
    *,
    nx,
    cw,
    tile,
    steps,
    interpret=False,
    fused_scan=None,
    scan_stats_only=False,
):
    """One column-blocked Jacobi relaxation call (P fused sweeps).

    ``key_dst``/``lab_dst`` are DONATED ping-pong buffers (aliased to the
    outputs, never read): they must carry the constant aprons (pack-time
    values — rows [0, p) and [p + h2, hp), lanes [0, 128) and
    [128 + nx·cw, wp)), because the kernel writes centre regions only.
    The padded planes have real data at rows [p, p + h), lanes
    [_STRIPE_HALO, _STRIPE_HALO + w), total width nx·cw + 2·_STRIPE_HALO
    (build with pack geometry wp/col_off — stripes beyond w hold inert
    NEVER_FILL padding).

    Returns the same tuple shape as relax_block (key', lab', flags,
    not_converged, sat[, y]); flags/sat are per (stripe, band) program.
    not_converged == False certifies the global fixed point (Jacobi block +
    last-sweep witness).
    """
    hp, wp = v_pad.shape
    p = steps
    if p > _STRIPE_HALO:
        raise ValueError(
            f"relax_block2d needs steps <= {_STRIPE_HALO} (lane halo); "
            f"got {p}"
        )
    gy = (hp - 2 * p) // tile
    win = tile + 2 * p
    cwin = cw + 2 * _STRIPE_HALO
    if wp != nx * cw + 2 * _STRIPE_HALO:
        raise ValueError(f"plane width {wp} != {nx}*{cw} + {2 * _STRIPE_HALO}")

    nprog = nx * gy
    out_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec((nprog, 1), lambda *_: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1), lambda *_: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((nprog, 1), lambda *_: (0, 0), memory_space=pltpu.SMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((hp, wp), jnp.int32),
        jax.ShapeDtypeStruct((hp, wp), jnp.int32),
        jax.ShapeDtypeStruct((nprog, 1), jnp.int32),
        jax.ShapeDtypeStruct((1, 1), jnp.int32),
        jax.ShapeDtypeStruct((nprog, 1), jnp.int32),
    ]
    scratch = [
        pltpu.VMEM((2, win, cwin), jnp.int8),
        pltpu.VMEM((2, win, cwin), jnp.int32),
        pltpu.VMEM((2, win, cwin), jnp.int32),
    ]
    if fused_scan is not None:
        if not scan_stats_only:
            out_specs.append(pl.BlockSpec(memory_space=pl.ANY))
            out_shape.append(
                jax.ShapeDtypeStruct((gy * tile, wp), jnp.int32)
            )
        out_specs.append(
            pl.BlockSpec((nprog, 3), lambda *_: (0, 0), memory_space=pltpu.SMEM)
        )
        out_shape.append(jax.ShapeDtypeStruct((nprog, 3), jnp.int32))
        if not scan_stats_only:
            scratch += [
                pltpu.VMEM((tile, cwin), jnp.int32),
                pltpu.VMEM((1, cwin), jnp.int32),
            ]
    scratch.append(
        pltpu.SemaphoreType.DMA(
            (2, 6 if (fused_scan and not scan_stats_only) else 5)
        )
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nx, gy),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 5,
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    outs = pl.pallas_call(
        partial(
            _relax_kernel2d,
            tile=tile,
            steps=steps,
            cw=cw,
            fused_scan=fused_scan,
            scan_stats_only=scan_stats_only,
        ),
        grid_spec=grid_spec,
        out_shape=out_shape,
        input_output_aliases={3: 0, 4: 1},
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT_BYTES),
        interpret=interpret,
    )(v_pad, key_in, lab_in, key_dst, lab_dst)
    key2, lab2, flags, chg, sat = outs[:5]
    base = (key2, lab2, flags[:, 0], chg[0, 0] > 0, sat[:, 0])
    if fused_scan is None:
        return base
    if scan_stats_only:
        return base + (outs[5],)  # (..., mstats)
    return base + (outs[5], outs[6])  # (..., y, mstats)


def relax_fixed_point2d(
    v_pad, key_pad, lab_pad, *, nx, cw, tile, steps, interpret=False,
    fused_scan=None, stats_only=False,
):
    """Iterate relax_block2d to the global fixed point (ping-pong planes).

    Returns (key, lab, starved) — or, with ``fused_scan=(col_lo, col_hi)``,
    (key, lab, y0, y0_valid, starved) where y0 is the merging component-min
    forward pass from call 1's epilogue (valid only when call 1 certified).
    Every call computes every window, so the LAST call's sat flags are the
    fixed-point saturation state.

    The alternate plane pair starts as bare constants (UNCLAIMED keys, zero
    labels — exactly the apron values everywhere); each call donates the
    older pair as its output buffers, whose centre it fully overwrites and
    whose aprons it never touches, so aprons stay constant forever.
    """
    alt_key = jnp.full_like(key_pad, jnp.int32(_UNCLAIMED))
    alt_lab = jnp.zeros_like(lab_pad)
    first = relax_block2d(
        v_pad, key_pad, lab_pad, alt_key, alt_lab, nx=nx, cw=cw, tile=tile,
        steps=steps, interpret=interpret, fused_scan=fused_scan,
        scan_stats_only=stats_only,
    )
    if fused_scan is not None and stats_only:
        key, lab, _, not_conv, sat, ms = first
        y0 = None  # stats-only epilogue: the scan tail recomputes pass 1
        y0_valid = jnp.logical_not(not_conv)
        mstats = (
            jnp.sum(ms[:, 0]), jnp.max(ms[:, 1]) > 0, jnp.min(ms[:, 2])
        )
    elif fused_scan is not None:
        key, lab, _, not_conv, sat, y0, ms = first
        y0_valid = jnp.logical_not(not_conv)
        mstats = (
            jnp.sum(ms[:, 0]), jnp.max(ms[:, 1]) > 0, jnp.min(ms[:, 2])
        )
    else:
        key, lab, _, not_conv, sat = first

    def body(state):
        key, lab, okey, olab, _, _ = state
        k2, l2, _, nc, sat = relax_block2d(
            v_pad, key, lab, okey, olab, nx=nx, cw=cw, tile=tile,
            steps=steps, interpret=interpret,
        )
        return k2, l2, key, lab, nc, sat

    key, lab, _, _, _, sat = jax.lax.while_loop(
        lambda s: s[4], body, (key, lab, key_pad, lab_pad, not_conv, sat)
    )
    starved = jnp.any(sat > 0)
    if fused_scan is not None:
        return key, lab, y0, y0_valid, mstats, starved
    return key, lab, starved


def _dilate_flags(flags: jnp.ndarray) -> jnp.ndarray:
    """Next call's active set: changed bands and their neighbours."""
    up = jnp.concatenate([flags[1:], jnp.zeros((1,), flags.dtype)])
    down = jnp.concatenate([jnp.zeros((1,), flags.dtype), flags[:-1]])
    return flags | up | down


def relax_fixed_point(
    v_pad, key_pad, lab_pad, *, tile=DEFAULT_TILE, steps=DEFAULT_STEPS, interpret=False
):
    """Iterate relax_block to the global fixed point on the padded domain.

    Returns (key, lab, starved): ``starved`` (scalar bool) is True iff the
    fixed point holds a claimed-but-unlabelled pixel — the d-field
    saturation signature (only reachable via a >= 2^23-px equal-level
    plateau; see the module docstring).  Each band's flag is taken from its
    LAST computed call (inactive bands' windows are unchanged by
    definition, so their previous flag still describes their final state).
    """
    hp, _ = v_pad.shape
    p = steps
    gy = (hp - 2 * p) // tile

    def body(state):
        key, lab, active, _, sat_bands = state
        key, lab, flags, not_conv, sat = jax.lax.cond(
            jnp.sum(active) * 3 > gy,
            lambda args: relax_block(
                *args, tile=tile, steps=steps, interpret=interpret, pipelined=True
            ),
            lambda args: relax_block(
                *args, tile=tile, steps=steps, interpret=interpret, pipelined=False
            ),
            (v_pad, key, lab, active),
        )
        sat_bands = jnp.where(active > 0, sat, sat_bands)
        return key, lab, _dilate_flags(flags), not_conv, sat_bands

    key, lab, _, _, sat_bands = jax.lax.while_loop(
        lambda s: s[3],
        body,
        (
            key_pad,
            lab_pad,
            jnp.ones((gy,), jnp.int32),
            jnp.bool_(True),
            jnp.zeros((gy,), jnp.int32),
        ),
    )
    return key, lab, jnp.any(sat_bands > 0)


def relax_fixed_point_fused(
    v_pad,
    key_pad,
    lab_pad,
    *,
    col_lo,
    col_hi,
    real_h,
    tile=DEFAULT_TILE,
    steps=DEFAULT_STEPS,
    interpret=False,
    stats_only=False,
):
    """relax_fixed_point that ALSO returns the merging component-min fwd pass.

    Call 1 runs dense/pipelined with the fused fwd-vertical scan epilogue;
    with the measured one-call schedule (ops.tune: steps above the typical
    chain length) that call usually both converges and certifies, so its y
    output IS the scan-merge pass-1 plane and the separate fwd read of the
    label plane (ops.scan_merge) is skipped.  Returns
    (key, lab, y0, y0_valid, mstats, starved); y0 is garbage when y0_valid
    is False (the caller falls back to the standalone fwd pass —
    bit-identical either way); ``mstats = (n_unclaimed_interior,
    any_claimed_border, interior_min_label)`` are the single-component
    shortcut scalars — the first is an exact COUNT so the batched stacked
    plane can compare it against its structural NEVER_FILL cell count
    (valid under y0_valid — see the kernel epilogue);
    ``starved`` is the d-field saturation flag (see relax_fixed_point).
    """
    hp, _ = v_pad.shape
    p = steps
    gy = (hp - 2 * p) // tile

    first = relax_block(
        v_pad,
        key_pad,
        lab_pad,
        jnp.ones((gy,), jnp.int32),
        tile=tile,
        steps=steps,
        interpret=interpret,
        pipelined=True,
        fused_scan=(col_lo, col_hi, real_h),
        scan_stats_only=stats_only,
    )
    if stats_only:
        key, lab, flags, not_conv, sat, ms = first
        y0 = None  # stats-only epilogue: the scan tail recomputes pass 1
    else:
        key, lab, flags, not_conv, sat, y0, ms = first
    y0_valid = jnp.logical_not(not_conv)
    mstats = (jnp.sum(ms[:, 0]), jnp.max(ms[:, 1]) > 0, jnp.min(ms[:, 2]))

    def body(state):
        key, lab, active, _, sat_bands = state
        key, lab, flags, nc, sat = jax.lax.cond(
            jnp.sum(active) * 3 > gy,
            lambda args: relax_block(
                *args, tile=tile, steps=steps, interpret=interpret, pipelined=True
            ),
            lambda args: relax_block(
                *args, tile=tile, steps=steps, interpret=interpret, pipelined=False
            ),
            (v_pad, key, lab, active),
        )
        sat_bands = jnp.where(active > 0, sat, sat_bands)
        return key, lab, _dilate_flags(flags), nc, sat_bands

    key, lab, _, _, sat = jax.lax.while_loop(
        lambda s: s[3], body, (key, lab, _dilate_flags(flags), not_conv, sat)
    )
    return key, lab, y0, y0_valid, mstats, jnp.any(sat > 0)


def resolve_relax_config(
    h: int, w: int, *, steps=None, tile=None, fwd_scan: bool = False
) -> tuple[int, int]:
    """Resolve the (steps, tile) schedule for an (h, w) domain.

    Contracts (pinned by test_resolution_contracts):

    * resolved steps come from the width bucket (ops.tune.relax_steps),
      with a LARGE-AREA bump to >= 32 when h > 2·w: the one-call schedule
      must cover the MAX claim chain over the whole domain, which grows
      with area — both for transform_batch stacks (the max over 64 piled
      cutouts beats any one image's typical chain; measured: the
      width-tuned steps 24 forces whole extra dense DMA rounds on the
      64×1024² stack, 1337 vs 1953 Mpix/s) and for tall single mosaics;
    * the measured tile table is looked up at the TABLE's steps when steps
      were resolved (so the area bump keeps the measured tile,
      re-validated against the VMEM model at the effective steps), but at
      the CALLER's steps when explicit — a steps sweep gets steps-matched
      auto tiles, never a table tile measured at other steps;
    * an RWT_RELAX_TILE env override is honoured VERBATIM (no fused cap,
      height clamp, or model shrink) — perf sweeps must measure the
      configuration they name; a too-big tile fails loudly at Mosaic
      compile time;
    * the fused-scan (merging) path caps by its own VMEM bound (the
      epilogue scratch OOM'd the segmenting-measured 8192 tile), and tall
      width-keyed tiles are clamped by the image height so they never
      inflate a shorter image's padded rows.
    """
    import os as _os

    from .tune import relax_steps, relax_tile

    # 'stats' (stats-only fused epilogue) has the segmenting footprint —
    # no fused tile cap applies (VERDICT r3 #1: this is what returns the
    # 8192 table tile 152 to the merging path).
    fwd_scan = fwd_scan is True
    steps_explicit = steps is not None
    if steps is None:
        steps = relax_steps(w)
        if h > 2 * w:
            steps = max(steps, 32)
    if tile is None:
        if _os.environ.get("RWT_RELAX_TILE"):
            tile = relax_tile(w, steps)
        else:
            lookup_steps = steps if steps_explicit else relax_steps(w)
            tile = relax_tile(w, lookup_steps) or auto_tile(w, steps)
            if fwd_scan:
                tile = min(
                    tile, auto_tile(w, steps, fused_scan=True, cap=tile)
                )
            tile = max(steps, min(tile, -(-h // 8) * 8))
            while (
                tile > steps
                and vmem_model_bytes(w, steps, tile, fwd_scan)
                > vmem_budget()
            ):
                tile -= 8
            if vmem_model_bytes(w, steps, tile, fwd_scan) > vmem_budget():
                # Even the minimum window (tile == steps) exceeds the VMEM
                # model: the image is too wide for a full-width band at this
                # schedule.  Fail here with a geometry hint instead of an
                # opaque Mosaic scoped-allocation OOM at compile time.
                raise ValueError(
                    f"image width {w} cannot fit a full-width relax band in "
                    f"VMEM even at the minimum window (tile == steps == "
                    f"{steps}: "
                    f"{vmem_model_bytes(w, steps, tile, fwd_scan)} B > "
                    f"{vmem_budget()} B). Split the image into column "
                    "tiles (parallel.tiled_transform with an x-axis mesh) "
                    "or reduce steps."
                )
    return steps, tile


def relax_packed_planes(
    img, labels0, *, tile=None, steps=None, interpret=False, fwd_scan=False,
    stripes=None,
):
    """Run the relaxation to its fixed point and return the PADDED planes:
    (key_pad, lab_pad, p, col_off, tile, ..., starved) with real data at
    rows [p, p + h), cols [col_off, col_off + w); ``starved`` (scalar bool,
    always last) is the d-field saturation flag (see relax_fixed_point).

    The claimed-ness gate (one_sweep) guarantees lab_pad is 0 at every
    unclaimed cell, so downstream kernels (ops.scan_merge) can consume the
    padded plane directly with out-of-domain cells acting as barriers.

    ``fwd_scan=True`` (merging path) inserts (y0, y0_valid, mstats) before
    starved: the component-min forward-vertical pass fused into the
    converging relax call plus the single-component shortcut scalars
    (see relax_fixed_point_fused).  ``fwd_scan='stats'`` emits the mstats
    scalars ONLY (y0 is None): segmenting-kernel footprint — the
    production merging path, whose scan tail recomputes pass 1 when the
    single-component shortcut does not fire (VERDICT r3 #1).

    Wide images run the column-blocked kernel (resolve_stripe_config —
    col_off = _STRIPE_HALO there, else col_off = steps); ``stripes=(nx,
    cw)`` forces a stripe grid (tests / perf sweeps).
    """
    img = jnp.asarray(img)
    h, w = img.shape
    if stripes is not None:
        nx, cw = stripes
        if steps is None:
            from .tune import relax_steps

            steps = relax_steps(w)
            if h > 2 * w:
                steps = max(steps, 32)
        if tile is None:
            tile = max(
                8,
                min(
                    _stripe_auto_tile(cw, steps, fwd_scan is True),
                    -(-h // 8) * 8,
                ),
            )
        cfg = (steps, tile, nx, cw)
    else:
        cfg = resolve_stripe_config(
            h, w, steps=steps, tile=tile, fwd_scan=fwd_scan
        )
    if cfg is not None:
        steps, tile, nx, cw = cfg
        if cw % 128 or nx * cw < w:
            raise ValueError(
                f"stripe grid nx={nx}, cw={cw} invalid for width {w}: cw "
                "must be a 128-multiple (lane-DMA granularity) and nx*cw "
                "must cover the image"
            )
        hs = _STRIPE_HALO
        wp = nx * cw + 2 * hs
        if labels0 is None:
            from .pallas_pack import pack_domain_fused

            v_pad, key_pad, lab_pad, _ = pack_domain_fused(
                img, tile, steps, interpret=interpret, wp=wp, col_off=hs
            )
        else:
            v_pad, key_pad, lab_pad = pack_domain(
                img, labels0, tile, steps, wp=wp, col_off=hs
            )
        if fwd_scan:
            key, lab, y0, y0_valid, mstats, starved = relax_fixed_point2d(
                v_pad, key_pad, lab_pad, nx=nx, cw=cw, tile=tile,
                steps=steps, interpret=interpret,
                fused_scan=(hs, hs + w - 1, h),
                stats_only=(fwd_scan == "stats"),
            )
            return key, lab, steps, hs, tile, y0, y0_valid, mstats, starved
        key, lab, starved = relax_fixed_point2d(
            v_pad, key_pad, lab_pad, nx=nx, cw=cw, tile=tile, steps=steps,
            interpret=interpret,
        )
        return key, lab, steps, hs, tile, starved

    steps, tile = resolve_relax_config(h, w, steps=steps, tile=tile, fwd_scan=fwd_scan)
    if labels0 is None:
        from .pallas_pack import pack_domain_fused

        v_pad, key_pad, lab_pad, _ = pack_domain_fused(
            img, tile, steps, interpret=interpret
        )
    else:
        v_pad, key_pad, lab_pad = pack_domain(img, labels0, tile, steps)
    if fwd_scan:
        key, lab, y0, y0_valid, mstats, starved = relax_fixed_point_fused(
            v_pad,
            key_pad,
            lab_pad,
            col_lo=steps,
            col_hi=steps + w - 1,
            real_h=h,
            tile=tile,
            steps=steps,
            interpret=interpret,
            stats_only=(fwd_scan == "stats"),
        )
        return key, lab, steps, steps, tile, y0, y0_valid, mstats, starved
    key, lab, starved = relax_fixed_point(
        v_pad, key_pad, lab_pad, tile=tile, steps=steps, interpret=interpret
    )
    return key, lab, steps, steps, tile, starved


def relax_transform_pallas(
    img,
    labels0,
    *,
    max_water_level: int = 254,
    tile=None,
    steps=None,
    interpret=False,
):
    """Full segmenting transform; bit-identical to ops.priority.relax_transform
    (and hence to the level-sweep drivers).  Returns
    (labels, claim_levels, starved); ``starved`` is the d-field saturation
    flag — when True the labels may diverge from reference semantics on a
    >= 2^23-px plateau and the caller should re-run on the exact engine
    (ops.priority).  ``tile=None`` picks the widest band that fits VMEM
    (auto_tile); ``steps=None`` picks the measured schedule
    (ops.tune.relax_steps).

    ``labels0=None`` means "seeds from the image" (reference find_local_minima
    semantics): the fused pack kernel (ops.pallas_pack) computes the seed mask,
    row-major numbering, and the packed planes in ONE banded HBM pass instead
    of the jnp seed pipeline + pack_domain's three full-plane update-slices.
    """
    key, lab, p, col_off, tile, starved = relax_packed_planes(
        img, labels0, tile=tile, steps=steps, interpret=interpret
    )
    img = jnp.asarray(img)
    h, w = img.shape
    key = jax.lax.dynamic_slice(key, (p, col_off), (h, w))
    lab = jax.lax.dynamic_slice(lab, (p, col_off), (h, w))
    claim_levels = jnp.where(
        key == _UNCLAIMED,
        jnp.int32(NEVER_FILL + 1),
        jax.lax.shift_right_logical(key, _D_BITS),
    )
    if max_water_level >= 254:  # NORMAL_MAX — every claim is <= 254
        # The kernel's claimed-ness gate (one_sweep) guarantees unclaimed
        # pixels keep lab = 0, so the lab plane IS the final label image —
        # no where(claim <= max) plane pass (XLA fuses the bare slice into
        # the consumer; claim_levels is DCE'd when the caller discards it).
        labels = lab
    else:
        labels = jnp.where(claim_levels <= max_water_level, lab, UNCOLOURED)
    return labels, claim_levels, starved
