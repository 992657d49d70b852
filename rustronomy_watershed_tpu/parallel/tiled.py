"""Tiled multi-device watershed: shard_map over a 2-D mesh with halo exchange.

The TPU-native replacement for the reference's shared-memory rayon parallelism
(SURVEY.md §2 "Parallelism & communication"): the image is tiled over a
('y', 'x') device mesh; each step exchanges a k-px halo over ICI
(``lax.ppermute``), runs k local Jacobi sweeps (bit-identical to k global
sweeps — information moves one 4-connected pixel per sweep), and reduces a
global "any pixel changed" flag with ``lax.psum``.  Region merging keeps the
parent table replicated: local adjacency scatter-mins are combined with
``lax.pmin`` and pointer jumping runs redundantly (and identically) on every
device, avoiding host round-trips.

Two tiled engines:

* **relax** (default wherever it applies): the priority-relaxation engine
  (ops.priority) tiled — each round exchanges k-px halos of the (L, d,
  label) planes and runs k local relax sweeps.  Stale halos are safe (keys
  decrease monotonically toward the unique fixed point; wrap-ghost
  corruption penetrates at most k-1 rings into the k-wide halo, which is
  cropped), and the global fixed point is detected with a psum'd
  centre-change flag.  O(longest claim chain / k) exchanges for the whole
  transform instead of per-level ring sums.
* **sweep**: the per-water-level flood loop (needed for the merging
  variant's per-level statistics, whose merge phase is inherently
  per-level).

An optional leading batch axis composes (dp-style): each device may hold a
(B_local, h, w) stack (BASELINE config 5: 64x1024² cutouts over v5e-8), with
per-batch parent tables.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..constants import INT32_MAX, NEVER_FILL, NORMAL_MAX, UNCOLOURED
from ..ops.flood import flood_sweep
from ..ops.priority import relax_sweep
from .halo import exchange_halo, global_interior_mask, refresh_halo_padded

_BIG = jnp.int32(INT32_MAX)
_BIG_L = NEVER_FILL + 1
_BIG_D = 2**30


def _take_per_batch(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather table[b, idx[b, ...]] for a (B, K+1) table and (B, ...) indices."""
    b = table.shape[0]
    flat = jnp.take_along_axis(table, idx.reshape(b, -1), axis=1)
    return flat.reshape(idx.shape)


def _batched_bincount(values: jnp.ndarray, length: int) -> jnp.ndarray:
    """(B, ...) int values -> (B, length) counts."""
    b = values.shape[0]
    flat = values.reshape(b, -1)
    rows = jax.lax.broadcasted_iota(jnp.int32, flat.shape, 0)
    out = jnp.zeros((b, length), dtype=jnp.int32)
    return out.at[rows.reshape(-1), flat.reshape(-1)].add(
        jnp.ones(flat.size, dtype=jnp.int32), mode="drop"
    )


def _merge_fixed_point(
    lab, *, n_labels, merge_mask, axes, control_axes
):
    """Transitive min-label union of all touching regions, mesh-globally.

    The parent table is replicated: per-device adjacency scatter-mins combine
    with ``lax.pmin``; pointer jumping runs identically everywhere.
    ``lab`` is (B, h, w); returns the relabelled tile.
    """
    b = lab.shape[0]
    ident = jnp.broadcast_to(
        jnp.arange(n_labels + 1, dtype=jnp.int32), (b, n_labels + 1)
    )

    def cond(state):
        return state[1]

    def body(state):
        parent, _ = state
        cur = _take_per_batch(parent, lab)
        cur_p = exchange_halo(cur, 1, *axes, off_grid_fill=UNCOLOURED)

        def differing(n):
            return jnp.where((n != UNCOLOURED) & (n != cur_p), n, _BIG)

        hp, wp = cur_p.shape[-2:]
        pad = [(0, 0), (1, 1), (1, 1)]
        pp = jnp.pad(cur_p, pad, constant_values=UNCOLOURED)
        diff_min = _BIG
        for dy, dx in ((-1, 0), (1, 0), (0, -1), (0, 1)):
            nb = pp[:, 1 + dy : 1 + dy + hp, 1 + dx : 1 + dx + wp]
            diff_min = jnp.minimum(diff_min, differing(nb))
        valid = (cur_p != UNCOLOURED) & merge_mask
        diff_min = jnp.where(valid, diff_min, _BIG)

        adj = jnp.full((b, n_labels + 1), _BIG, dtype=jnp.int32)
        rows = jax.lax.broadcasted_iota(jnp.int32, (b, hp * wp), 0)
        adj = adj.at[rows.reshape(-1), cur_p.reshape(-1)].min(
            diff_min.reshape(-1), mode="drop"
        )
        adj = lax.pmin(adj, axes)

        safe = jnp.minimum(adj, jnp.int32(n_labels))
        cand = jnp.where(adj != _BIG, _take_per_batch(parent, safe), _BIG)
        new_parent = jnp.minimum(parent, cand)

        def jcond(s):
            return s[1]

        def jbody(s):
            p, _ = s
            p2 = _take_per_batch(p, p)
            return p2, jnp.any(p2 != p)

        new_parent, _ = lax.while_loop(jcond, jbody, (new_parent, jnp.bool_(True)))
        changed = (
            lax.psum(
                jnp.any(new_parent != parent).astype(jnp.int32), control_axes
            )
            > 0
        )
        return new_parent, changed

    parent, _ = lax.while_loop(cond, body, (ident, jnp.bool_(True)))
    return _take_per_batch(parent, lab)


def _batched_sizes_from_levels(lab, lv, n_labels, max_water_level):
    """Per-tile (B, levels, K+1) cumulative claim counts (no column-0 fix —
    the caller psums across tiles first, then complements column 0)."""
    b = lab.shape[0]
    levels = max_water_level + 1
    labf = lab.reshape(b, -1)
    lvf = jnp.clip(lv.reshape(b, -1), 0, levels)
    rows = jax.lax.broadcasted_iota(jnp.int32, labf.shape, 0)
    counts = jnp.zeros((b, levels + 1, n_labels + 1), dtype=jnp.int32)
    counts = counts.at[rows.reshape(-1), lvf.reshape(-1), labf.reshape(-1)].add(
        jnp.ones(labf.size, dtype=jnp.int32), mode="drop"
    )
    return jnp.cumsum(counts[:, :levels], axis=1)


def _local_relax_driver(
    img_tile,
    lab_tile,
    *,
    global_shape,
    n_labels,
    max_water_level,
    merging,
    halo,
    collect,
    axis_y,
    axis_x,
    control_axes,
):
    """Tiled priority relaxation (runs under shard_map).  Shapes: (B, h, w).

    Halo staleness between exchanges is safe: the relaxation is a monotone
    asynchronous iteration with a unique fixed point (ops.priority), and
    convergence is only declared on a globally change-free round.
    """
    axes = (axis_y, axis_x)
    b, h, w = lab_tile.shape
    k = halo

    # Static image halo (exchange once) with the GLOBAL border rule: v_eff is
    # NEVER_FILL outside the global interior (the reference never paints
    # border pixels, src/lib.rs:220-233) — which also covers off-grid cells.
    v_p = exchange_halo(
        img_tile.astype(jnp.int32), k, axis_y, axis_x, off_grid_fill=NEVER_FILL
    )
    interior = global_interior_mask((h, w), global_shape, k, axis_y, axis_x)
    v_p = jnp.where(interior, v_p, NEVER_FILL)

    lab_tile = lab_tile.astype(jnp.int32)
    seeds = lab_tile != UNCOLOURED
    L = jnp.where(seeds, jnp.int32(0), jnp.int32(_BIG_L))
    d = jnp.where(seeds, jnp.int32(0), jnp.int32(_BIG_D))

    def body(state):
        (L, d, lab), _ = state
        Lp = exchange_halo(L, k, axis_y, axis_x, off_grid_fill=_BIG_L)
        dp = exchange_halo(d, k, axis_y, axis_x, off_grid_fill=_BIG_D)
        labp = exchange_halo(lab, k, axis_y, axis_x, off_grid_fill=UNCOLOURED)
        st = (Lp, dp, labp)
        for _ in range(k):
            st = relax_sweep(v_p, st)
        L2, d2, lab2 = (a[..., k:-k, k:-k] for a in st)
        changed = (
            lax.psum(
                jnp.any((L2 != L) | (d2 != d) | (lab2 != lab)).astype(jnp.int32),
                control_axes,
            )
            > 0
        )
        return (L2, d2, lab2), changed

    (L, d, lab), _ = lax.while_loop(
        lambda s: s[1], body, ((L, d, lab_tile), jnp.bool_(True))
    )
    labels = jnp.where(L <= max_water_level, lab, UNCOLOURED)
    return _relax_collect_tail(
        labels,
        L,
        global_shape=global_shape,
        n_labels=n_labels,
        max_water_level=max_water_level,
        merging=merging,
        collect=collect,
        axis_y=axis_y,
        axis_x=axis_x,
        control_axes=control_axes,
    )


def _relax_collect_tail(
    labels,
    L,
    *,
    global_shape,
    n_labels,
    max_water_level,
    merging,
    collect,
    axis_y,
    axis_x,
    control_axes,
):
    """Shared statistics/merge tail of the tiled relax engines: per-level
    curves and history snapshots come post-hoc from the claim levels L.

    ``collect='claims'`` skips the tail entirely and returns the raw
    (labels, claim levels) planes — the mesh merge-curve path
    (models/base.transform_to_list) derives merged per-level statistics
    from them with ONE relax pass instead of the per-level sweep loop."""
    axes = (axis_y, axis_x)
    h, w = labels.shape[-2:]

    if collect == "claims":
        return labels, L

    if merging:
        # Final merged labels: transitive union over the claimed set (the
        # per-level merge curve needs the sweep engine; final labels do not).
        merge_mask = global_interior_mask((h, w), global_shape, 1, axis_y, axis_x)
        labels = _merge_fixed_point(
            labels,
            n_labels=n_labels,
            merge_mask=merge_mask,
            axes=axes,
            control_axes=control_axes,
        )
        if collect != "none":
            raise ValueError("tiled relax: merging supports collect='none' only")

    if collect == "none":
        return labels

    if collect == "sizes":
        cum = _batched_sizes_from_levels(labels, L, n_labels, max_water_level)
        cum = lax.psum(cum, axes)
        total = global_shape[0] * global_shape[1]
        coloured = jnp.sum(cum[:, :, 1:], axis=2)
        cum = cum.at[:, :, 0].set(total - coloured)
        return labels, jnp.swapaxes(cum, 0, 1)  # (levels, B, K+1)

    if collect == "history":
        levels = max_water_level + 1
        lvls = jnp.arange(levels, dtype=jnp.int32)[:, None, None, None]
        hist = jnp.where(L[None] <= lvls, labels[None], UNCOLOURED)
        return labels, hist  # (levels, B, h, w)

    raise ValueError(f"unknown collect mode {collect!r}")


def _local_relax_pallas_driver(
    img_tile,
    lab_tile,
    *,
    global_shape,
    n_labels,
    max_water_level,
    merging,
    halo,
    collect,
    axis_y,
    axis_x,
    control_axes,
    band_tile,
    interpret,
    with_stats=False,
):
    """Tiled priority relaxation with the Pallas packed-key kernel per tile.

    Per round: exchange k-px halos of the packed (key, label) planes over ICI
    (2 planes instead of the jnp engine's 3), then ONE kernel call runs k
    fused relaxation sweeps per tile — k sweeps per HBM round-trip instead of
    one, which is what makes the mesh path single-chip-class per chip.

    Soundness (on top of ops/pallas_relax.py's single-device arguments):

    * trajectory: apron ROWS are frozen during a call (the kernel writes band
      centres only), so boundary pixels relax against round-start neighbour
      values — a bounded-staleness asynchronous iteration.  Keys decrease
      monotonically to the unique fixed point and labels have a unique
      solution given the key fixed point, so the FINAL state is bit-identical
      to the jnp tiled engine and the single-device drivers even though the
      trajectory differs.
    * padding: lane-padding columns carry UNCLAIMED keys and NEVER_FILL
      values — they can neither claim nor donate, so no corruption enters
      from them; halo columns evolve within a call (including one ring of
      wrap-ghost corruption per sweep from the window edge, penetrating at
      most k-1 < k columns into the halo) and are cropped + re-exchanged
      every round.
    * convergence — WITNESS + HALO STABILITY: a tile needs another round
      iff its last call's pipelined convergence witness did not certify
      (ops/pallas_relax.py: last-sweep centre quiescence over a
      Jacobi-consistent call certifies the tile's fixed point GIVEN its
      call-start halos) or the end-of-round refresh changed any incoming
      halo strip.  When psum(need) == 0, every tile is certified w.r.t.
      halo values that are still the neighbours' current centre values —
      i.e. every real pixel satisfies its update equation against current
      neighbours: the global fixed point.  No trailing observe-quiescence
      round is needed (the previous change-flag protocol required one full
      extra round to SEE quiescence; on a 1x1 mesh this protocol halves
      the round count).  Strip stability is judged against the previous
      round's INCOMING strips, not in-plane halo content (which carries
      the sweeps' ghost corruption between refreshes).
    """
    from ..ops import pallas_relax as pr

    b, h, w = lab_tile.shape
    k = halo

    # Static image plane: exchange once, apply the GLOBAL border rule, embed
    # into the kernel's lane-padded domain as biased int8.  The whole setup
    # runs at int8 width (bias BEFORE the exchange — NEVER_FILL biases to
    # 127, still the int8 max, so ghost cells keep "can never flood"): the
    # halo collective and the padding passes then move a quarter of the
    # bytes of the previous int32 pipeline, with bit-identical results.
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
    gy = h // band_tile
    active = jnp.ones((gy,), jnp.int32)

    # State lives in the kernel's PADDED geometry across rounds; each round
    # only refreshes the thin halo band (refresh_halo_padded) instead of
    # re-concatenating + re-padding full planes, so the kernel's in-place
    # aliasing keeps per-round HBM traffic at strips + windows (measured at
    # 4096² on a 1x1 hardware mesh: the full-plane repack variant cost an
    # extra ~4 plane passes per round).  Lane-padding / halo cells
    # accumulate wrap-ghost corruption between refreshes; that is safe for
    # the same reason the old discard-and-repad was: ghost influence moves
    # <= 1 px per sweep, so reaching a CENTRE cell from the padding (>= k+1
    # cells away) cannot happen within one k-sweep round, and every halo
    # cell (<= k away) is overwritten by the next refresh — including
    # off-grid halos at mesh edges, which are re-filled every round.
    hp = h + 2 * k
    key_pad = jnp.full((b, hp, wp), unclaimed, dtype=jnp.int32)
    key_pad = jax.lax.dynamic_update_slice(key_pad, key0, (0, k, k))
    lab_pad = jnp.zeros((b, hp, wp), dtype=jnp.int32)
    lab_pad = jax.lax.dynamic_update_slice(lab_pad, lab0, (0, k, k))

    # Convergence protocol: WITNESS + HALO STABILITY.  A tile needs another
    # round iff (a) its last kernel call's pipelined convergence witness did
    # not certify its local fixed point, or (b) the end-of-round refresh
    # changed any of its incoming halo strips (compared against the previous
    # round's strips — comparing against in-plane halo content would see the
    # sweeps' ghost corruption).  When psum(need) == 0, every tile is
    # certified w.r.t. halo values that are STILL the neighbours' current
    # centre values — a global fixed point, with no trailing
    # observe-quiescence round (the old protocol needed a fully change-free
    # round to stop; on a 1x1 mesh this halves the round count).  Tiles
    # with need=False skip their kernel call entirely (all-inactive sparse
    # call: zero window DMA) but still participate in every collective.
    # On a DEGENERATE 1x1 mesh every halo is off-grid: the planes are
    # initialised to exactly the off-grid fill (UNCLAIMED / 0 / NEVER_FILL)
    # and padding cells are pinned inert by the kernel's restart clamp, so
    # the refresh is the identity and the strips are constants — skip both
    # (measured on hardware: the refresh/carry plumbing cost ~0.8 ms per
    # transform at 4096²).  The protocol degenerates to the kernel's own
    # pipelined witness, which is exactly the dense engine's certificate.
    degenerate = lax.axis_size(axis_y) == 1 and lax.axis_size(axis_x) == 1

    def _refresh_strips(kp, lp):
        if degenerate:
            return kp, lp, ()
        kp, ks = refresh_halo_padded(
            kp, k, h, w, axis_y, axis_x,
            off_grid_fill=pr._UNCLAIMED, return_strips=True,
        )
        lp, ls = refresh_halo_padded(
            lp, k, h, w, axis_y, axis_x,
            off_grid_fill=UNCOLOURED, return_strips=True,
        )
        return kp, lp, ks + ls

    def _strips_changed(old, new):
        c = jnp.bool_(False)
        for a, bnew in zip(old, new):
            c = c | jnp.any(a != bnew)
        return c

    def _run(args):
        kp, lp = args
        nc = jnp.bool_(False)
        keys, labs = [], []
        for i in range(b):  # B is small and static; sequential kernel calls
            k2, l2, _, nc_i, _ = pr.relax_block(
                v_pad[i],
                kp[i],
                lp[i],
                active,
                tile=band_tile,
                steps=k,
                interpret=interpret,
                pipelined=True,
                ctr_cols=(k, k + w),
            )
            keys.append(k2)
            labs.append(l2)
            nc = nc | nc_i
        return jnp.stack(keys), jnp.stack(labs), nc

    def _skip(args):
        kp, lp = args
        idle = jnp.zeros((gy,), jnp.int32)
        keys, labs = [], []
        for i in range(b):
            # All-inactive SPARSE call: no window DMA, no compute — the
            # aliased planes pass through; certified state is preserved.
            k2, l2, _, _, _ = pr.relax_block(
                v_pad[i],
                kp[i],
                lp[i],
                idle,
                tile=band_tile,
                steps=k,
                interpret=interpret,
                pipelined=False,
                ctr_cols=(k, k + w),
            )
            keys.append(k2)
            labs.append(l2)
        return jnp.stack(keys), jnp.stack(labs), jnp.bool_(False)

    key_pad, lab_pad, strips = _refresh_strips(key_pad, lab_pad)

    def body(state):
        key_pad, lab_pad, strips, need, _, stats = state
        key_pad, lab_pad, nc = lax.cond(
            need, _run, _skip, (key_pad, lab_pad)
        )
        key_pad, lab_pad, strips2 = _refresh_strips(key_pad, lab_pad)
        need2 = nc | _strips_changed(strips, strips2)
        glob = lax.psum(need2.astype(jnp.int32), control_axes) > 0
        if with_stats:
            # rounds executed / tile kernel-call runs (scaling study only —
            # the extra psum stays off the production path).
            stats = stats + jnp.stack(
                [
                    jnp.int32(1),
                    lax.psum(need.astype(jnp.int32), control_axes),
                ]
            )
        return key_pad, lab_pad, strips2, need2, glob, stats

    key_pad, lab_pad, _, _, _, stats = lax.while_loop(
        lambda s: s[4],
        body,
        (
            key_pad,
            lab_pad,
            strips,
            jnp.bool_(True),
            jnp.bool_(True),
            jnp.zeros((2,), jnp.int32),
        ),
    )
    lab = jax.lax.slice(lab_pad, (0, k, k), (b, k + h, k + w))
    # Claim levels are only materialised when a consumer needs them: at the
    # default full depth (max_water_level >= NORMAL_MAX) the kernel's
    # claimed-ness gate guarantees unclaimed pixels keep lab = 0, so the lab
    # plane IS the final label image — same extraction-pass skip as the
    # dense driver (ops/pallas_relax.relax_transform_pallas).  This saves
    # the key-plane read + where pass per transform for the headline
    # collect='none' path.
    need_L = (collect != "none") or (max_water_level < NORMAL_MAX)
    if need_L:
        key = jax.lax.slice(key_pad, (0, k, k), (b, k + h, k + w))
        L = jnp.where(
            key == unclaimed,
            jnp.int32(_BIG_L),
            jax.lax.shift_right_logical(key, pr._D_BITS),
        )
    else:
        L = None
    if max_water_level >= NORMAL_MAX:
        labels = lab
    else:
        labels = jnp.where(L <= max_water_level, lab, UNCOLOURED)
    if with_stats:
        return (
            _relax_collect_tail(
                labels,
                L,
                global_shape=global_shape,
                n_labels=n_labels,
                max_water_level=max_water_level,
                merging=merging,
                collect=collect,
                axis_y=axis_y,
                axis_x=axis_x,
                control_axes=control_axes,
            ),
            stats,
        )
    return _relax_collect_tail(
        labels,
        L,
        global_shape=global_shape,
        n_labels=n_labels,
        max_water_level=max_water_level,
        merging=merging,
        collect=collect,
        axis_y=axis_y,
        axis_x=axis_x,
        control_axes=control_axes,
    )


def _tiled_flood_fixed_point(
    img_p, lab, lvl, *, halo, paint_mask, axis_y, axis_x, control_axes
):
    """Flood one water level to the mesh-global fixed point: per round,
    exchange a halo-px label halo over ICI, run ``halo`` local Jacobi
    sweeps (bit-identical to halo global sweeps), psum the change flag.
    Returns (labels, rounds) — shared by the whole-transform driver and
    the per-level observability step so their semantics can never drift."""

    def body(state):
        lab, _, n = state
        lab_p = exchange_halo(lab, halo, axis_y, axis_x, off_grid_fill=UNCOLOURED)
        lab_p = lax.fori_loop(
            0, halo, lambda i, lp: flood_sweep(img_p, lp, lvl, paint_mask), lab_p
        )
        new = lab_p[..., halo:-halo, halo:-halo]
        changed = (
            lax.psum(jnp.any(new != lab).astype(jnp.int32), control_axes) > 0
        )
        return new, changed, n + 1

    lab, _, rounds = lax.while_loop(
        lambda s: s[1], body, (lab, jnp.bool_(True), jnp.int32(0))
    )
    return lab, rounds


def _local_level_driver(
    img_tile,
    lab_tile,
    *,
    global_shape,
    n_labels,
    max_water_level,
    merging,
    halo,
    collect,
    axis_y,
    axis_x,
    control_axes,
):
    """Per-device level-sweep body (runs under shard_map).  Shapes: (B, h, w).

    ``control_axes`` covers ALL mesh axes (incl. a batch axis): every loop
    predicate is reduced over it so all devices execute identical collective
    sequences — divergent trip counts across batch groups deadlock the
    in-process CPU communicator and serialize poorly on ICI.  Converged
    groups simply run no-op sweeps.
    """
    axes = (axis_y, axis_x)
    img_tile = img_tile.astype(jnp.int32)
    b, h, w = lab_tile.shape

    # Image halo is static across the whole transform: exchange once.
    img_p = exchange_halo(img_tile, halo, axis_y, axis_x, off_grid_fill=NEVER_FILL)
    paint_mask = global_interior_mask((h, w), global_shape, halo, axis_y, axis_x)
    merge_mask = global_interior_mask((h, w), global_shape, 1, axis_y, axis_x)

    # Global per-level pixel-value counts for the level-skip early exit
    # (reduced over ALL axes: the skip decision must be mesh-uniform).
    vhist = lax.psum(_batched_bincount(img_tile, 256), control_axes)

    def step(lab, lvl):
        lab, _ = _tiled_flood_fixed_point(
            img_p, lab, lvl, halo=halo, paint_mask=paint_mask,
            axis_y=axis_y, axis_x=axis_x, control_axes=control_axes,
        )
        if merging:
            lab = _merge_fixed_point(
                lab,
                n_labels=n_labels,
                merge_mask=merge_mask,
                axes=axes,
                control_axes=control_axes,
            )
        return lab

    levels = max_water_level + 1

    def run_lvl(lvl, lab):
        return lax.cond(
            (lvl == 0) | jnp.any(vhist[:, lvl] > 0),
            lambda l: step(l, lvl),
            lambda l: l,
            lab,
        )

    if collect == "none":
        final = lax.fori_loop(0, levels, run_lvl, lab_tile)
        return final

    if collect == "sizes":
        out = jnp.zeros((levels, b, n_labels + 1), dtype=jnp.int32)

        # Column 0 is the COMPLEMENT against the original domain size, not a
        # direct bincount: mesh padding pixels are UNCOLOURED forever and
        # must not inflate the uncoloured count (same rule as
        # _relax_collect_tail).
        total = global_shape[0] * global_shape[1]

        def body(lvl, carry):
            lab, out = carry
            lab = run_lvl(lvl, lab)
            counts = lax.psum(_batched_bincount(lab, n_labels + 1), axes)
            counts = counts.at[:, 0].set(
                total - jnp.sum(counts[:, 1:], axis=1)
            )
            return lab, out.at[lvl].set(counts)

        final, out = lax.fori_loop(0, levels, body, (lab_tile, out))
        return final, out

    if collect == "history":
        out = jnp.zeros((levels, b, h, w), dtype=jnp.int32)

        def body(lvl, carry):
            lab, out = carry
            lab = run_lvl(lvl, lab)
            return lab, out.at[lvl].set(lab)

        final, out = lax.fori_loop(0, levels, body, (lab_tile, out))
        return final, out

    raise ValueError(f"unknown collect mode {collect!r}")


def _mesh_pad(img, labels0, ny: int, nx: int):
    """Embed (B, H, W) arrays in a mesh-divisible domain with INERT padding.

    Padding pixels get NEVER_FILL values / UNCOLOURED labels at the bottom /
    right; every driver applies its interior rule against the ORIGINAL
    (gh, gw) via ``global_interior_mask``, so padded cells (like the original
    1-px border) can never claim, donate, or act as merge centres — the crop
    back to (gh, gw) is bit-identical to the exact-divisible run.  H pads to
    a multiple of 8*ny so the Pallas engine's band-tile divisor search stays
    viable on the per-device tile height.
    """
    _, gh, gw = img.shape
    pad_h = -gh % (8 * ny) if gh >= 8 * ny else -gh % ny
    pad_w = -gw % nx
    if pad_h == 0 and pad_w == 0:
        return img, labels0
    pads = ((0, 0), (0, pad_h), (0, pad_w))
    img = jnp.pad(img, pads, constant_values=NEVER_FILL)
    labels0 = jnp.pad(labels0, pads, constant_values=UNCOLOURED)
    return img, labels0


def tiled_transform(
    img,
    labels0,
    mesh: Mesh,
    *,
    n_labels: int,
    max_water_level: int,
    merging: bool = False,
    halo: int | None = None,
    collect: str = "none",
    axis_y: str = "y",
    axis_x: str = "x",
    axis_batch: str | None = None,
    backend: str = "auto",
    with_stats: bool = False,
):
    """Run the full watershed tiled over ``mesh``.

    ``img``/``labels0``: (H, W) or (B, H, W) with any H and W — non-divisible
    shapes (e.g. the (H+2, W+2) edge-corrected domain on an even mesh) are
    embedded in a mesh-divisible plane with inert padding (``_mesh_pad``) and
    cropped on exit.  With ``axis_batch`` set, the leading batch axis is
    additionally sharded over that mesh axis (dp x spatial).  Returns final
    labels, plus (levels, B, K+1) lake sizes when ``collect='sizes'`` or
    (levels, B, H, W) snapshots when ``collect='history'``.

    ``backend``: 'relax_pallas' | 'relax' | 'sweep' | 'auto'.  'auto' uses a
    tiled relaxation engine wherever it applies (segmenting always; merging
    final labels) — the Pallas packed-key engine on TPU meshes when the tile
    geometry allows it, the jnp engine otherwise — and the per-level sweep
    loop for merging statistics.  All are bit-identical to the single-device
    drivers.

    ``halo=None`` picks a schedule-aware width: up to the tuned fused-sweep
    count for the per-device tile width (ops.tune.relax_steps — the relax
    engines run k local sweeps per exchange, so a tuned-k halo converges in
    ~one exchange round per claim-chain length), clamped to the local tile
    extents.  Pass an explicit k to trade strip width against round count.

    ``with_stats=True`` (relax_pallas + collect='none' only) additionally
    returns a replicated int32 vector [exchange rounds executed, total tile
    kernel-call runs] — the mesh scaling study's instrumentation
    (tools/mesh_scaling.py); the extra per-round psum stays off the
    production path.
    """
    img = jnp.asarray(img)
    labels0 = jnp.asarray(labels0, dtype=jnp.int32)
    squeeze = img.ndim == 2
    if squeeze:
        img = img[None]
        labels0 = labels0[None]
    _, gh, gw = img.shape
    ny = mesh.shape[axis_y]
    nx = mesh.shape[axis_x]
    img, labels0 = _mesh_pad(img, labels0, ny, nx)
    _, gh2, gw2 = img.shape
    h_local, w_local = gh2 // ny, gw2 // nx

    if halo is None:
        from ..ops.tune import relax_steps

        halo = max(1, min(relax_steps(w_local), h_local, w_local))

    on_tpu = next(iter(mesh.devices.flat)).platform == "tpu"
    if backend == "auto":
        backend = _auto_backend(on_tpu, merging, collect, h_local, w_local, halo)

    extra = {}
    if backend == "relax_pallas":
        halo = _round_up8(halo)  # kernel DMA slices: steps multiple of 8
        band_tile = _pick_band_tile(h_local, w_local, halo)
        if band_tile is None or halo > w_local:
            raise ValueError(
                f"tiled relax_pallas needs a band tile t | {h_local} with "
                f"8 <= {halo} <= t and halo <= tile width {w_local}; use "
                "backend='relax' for this geometry"
            )
        driver = _local_relax_pallas_driver
        extra = {"band_tile": band_tile, "interpret": not on_tpu}
        if with_stats:
            extra["with_stats"] = True
    elif backend == "relax":
        driver = _local_relax_driver
    else:
        driver = _local_level_driver

    spec = P(axis_batch, axis_y, axis_x)
    local = partial(
        driver,
        # ORIGINAL shape, not the padded one: every driver derives its
        # interior / paint / merge masks and the sizes column-0 complement
        # from it (global_interior_mask), which is what keeps the padding
        # inert (see _mesh_pad).
        global_shape=(gh, gw),
        n_labels=n_labels,
        max_water_level=max_water_level,
        merging=merging,
        halo=halo,
        collect=collect,
        axis_y=axis_y,
        axis_x=axis_x,
        control_axes=tuple(mesh.axis_names),
        **extra,
    )
    if with_stats and (backend != "relax_pallas" or collect != "none"):
        raise ValueError(
            "with_stats=True needs backend='relax_pallas' and collect='none'"
        )
    if collect == "none":
        out_specs = (spec, P(None)) if with_stats else spec
    elif collect == "sizes":
        out_specs = (spec, P(None, axis_batch, None))
    elif collect == "claims":
        if merging or backend not in ("relax", "relax_pallas"):
            raise ValueError(
                "collect='claims' is the relax engines' raw (labels, claim "
                "levels) output; use merging=False with a relax backend"
            )
        out_specs = (spec, spec)
    else:  # history
        out_specs = (spec, P(None, axis_batch, axis_y, axis_x))

    fn = jax.jit(
        jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(spec, spec),
            out_specs=out_specs,
            check_vma=False,
        )
    )
    out = fn(img, labels0)
    if collect == "none":
        if with_stats:
            out, stats = out
            out = out[..., :gh, :gw]
            return (out[0] if squeeze else out), stats
        out = out[..., :gh, :gw]
        return out[0] if squeeze else out
    labels, stats = out[0][..., :gh, :gw], out[1]
    if collect in ("history", "claims"):
        stats = stats[..., :gh, :gw]
    if squeeze:
        if collect == "claims":
            return labels[0], stats[0]
        return labels[0], stats[:, 0]
    return labels, stats


def _round_up8(k: int) -> int:
    return max(8, -(-k // 8) * 8)


def _auto_backend(
    on_tpu: bool, merging: bool, collect: str, h_local: int, w_local: int, halo: int
) -> str:
    """backend='auto' resolution.  Eligibility for 'relax_pallas' must mirror
    EVERY constraint the relax_pallas branch enforces (incl. halo <= tile
    width) — 'auto' must never raise for a geometry the jnp engine can
    serve."""
    if merging and collect != "none":
        return "sweep"
    k8 = _round_up8(halo)
    if on_tpu and k8 <= w_local and _pick_band_tile(h_local, w_local, k8):
        return "relax_pallas"
    return "relax"


def _pick_band_tile(h: int, w: int, k: int) -> int | None:
    """Largest band height t with t | h, t multiple of 8, k <= t <= the VMEM
    cap for this tile width (ops.pallas_relax.auto_tile); None if impossible.

    ``auto_tile(w, steps=k)`` internally sizes the footprint from the
    lane-padded window width roundup(w + 2k, 128) — exactly the width the
    tiled kernel runs on (_local_relax_pallas_driver pads to the same wp),
    so no extra padding correction is needed here."""
    from ..ops.pallas_relax import auto_tile

    cap = min(auto_tile(w, steps=k), h)
    t = (cap // 8) * 8
    while t >= max(k, 8):
        if h % t == 0:
            return t
        t -= 8
    return None


def _local_level_step(
    img_tile,
    lab_tile,
    lvl,
    *,
    global_shape,
    n_labels,
    merging,
    halo,
    axis_y,
    axis_x,
    control_axes,
):
    """ONE water level on a mesh tile (runs under shard_map): flood to the
    global fixed point, then the merge phase (merging variant).  Shapes
    (B, h, w); returns (labels, rounds) where ``rounds`` counts the
    halo-exchange iterations (the mesh path's analogue of the reference's
    per-colouring-iteration progress ticks, src/lib.rs:1395-1398)."""
    axes = (axis_y, axis_x)
    img_tile = img_tile.astype(jnp.int32)
    h, w = lab_tile.shape[-2:]
    img_p = exchange_halo(img_tile, halo, axis_y, axis_x, off_grid_fill=NEVER_FILL)
    paint_mask = global_interior_mask((h, w), global_shape, halo, axis_y, axis_x)

    lab, rounds = _tiled_flood_fixed_point(
        img_p, lab_tile, lvl, halo=halo, paint_mask=paint_mask,
        axis_y=axis_y, axis_x=axis_x, control_axes=control_axes,
    )
    if merging:
        merge_mask = global_interior_mask((h, w), global_shape, 1, axis_y, axis_x)
        lab = _merge_fixed_point(
            lab,
            n_labels=n_labels,
            merge_mask=merge_mask,
            axes=axes,
            control_axes=control_axes,
        )
    return lab, rounds


class MeshLevelStepper:
    """Host-stepped per-level driver over a mesh: the observability loop
    (hooks / plots / progress / debug / checkpoints) calls ``step`` once per
    water level, exactly like the single-device ``level_step``, but with the
    level's flood fixed point + merge phase running tiled over the mesh
    (halo exchange over ICI, psum convergence, replicated merge tables).
    Mirrors the reference, whose hooks fire under its parallel runtime
    (src/lib.rs:1509-1518).

    ``prepare`` embeds the (H, W) domain in a mesh-divisible padded plane
    (``_mesh_pad`` — inert padding, original-shape interior rule); ``crop``
    restores the (H, W) view for hooks/plots/checkpoints.  The padded label
    state stays on device between levels.
    """

    def __init__(
        self,
        mesh: Mesh,
        *,
        n_labels: int,
        merging: bool,
        halo: int = 4,
        axis_y: str = "y",
        axis_x: str = "x",
    ):
        self.mesh = mesh
        self.axis_y, self.axis_x = axis_y, axis_x
        self.ny = mesh.shape[axis_y]
        self.nx = mesh.shape[axis_x]
        self._shape = None
        self._step = None  # built in prepare (needs the domain shape)
        self._kw = dict(
            n_labels=n_labels,
            merging=merging,
            halo=halo,
            axis_y=axis_y,
            axis_x=axis_x,
            control_axes=tuple(mesh.axis_names),
        )

    def prepare(self, img, labels0):
        """(padded device img, padded device labels); records the crop.

        Re-preparing with the SAME domain shape (e.g. a checkpoint resume)
        reuses the compiled step — a fresh jax.jit would recompile an
        identical program, which costs 30-90 s per program on tunnelled dev
        platforms with no cross-object compilation-cache hits."""
        from .._compat import cache_resilient

        img = jnp.asarray(img)[None]
        labels0 = jnp.asarray(labels0, dtype=jnp.int32)[None]
        shape = img.shape[1:]
        img2, lab2 = _mesh_pad(img, labels0, self.ny, self.nx)
        if self._step is None or shape != self._shape:
            self._shape = shape
            spec = P(None, self.axis_y, self.axis_x)
            self._step = cache_resilient(
                jax.jit(
                    jax.shard_map(
                        partial(
                            _local_level_step, global_shape=shape, **self._kw
                        ),
                        mesh=self.mesh,
                        in_specs=(spec, spec, P()),
                        out_specs=(spec, P()),
                        check_vma=False,
                    )
                )
            )
        return img2, lab2

    def step(self, img, labels, lvl):
        """One water level; returns (padded labels, iteration count)."""
        labels, rounds = self._step(img, labels, jnp.int32(lvl))
        return labels, rounds

    def crop(self, labels) -> np.ndarray:
        gh, gw = self._shape
        return np.asarray(labels)[0, :gh, :gw]


def make_mesh(n_devices: int | None = None, axis_names=("y", "x")) -> Mesh:
    """A near-square 2-D mesh over the available devices."""
    devs = np.asarray(jax.devices()[: n_devices or len(jax.devices())])
    n = devs.size
    ny = int(np.floor(np.sqrt(n)))
    while n % ny:
        ny -= 1
    return Mesh(devs.reshape(ny, n // ny), axis_names)
