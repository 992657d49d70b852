"""Scan-based component-min labelling: the merging variant's final labels.

At the final water level the merging (void-filling) transform's output is
"every 4-connected component of the claimed set takes its minimum seed
label" (reference merge semantics under the pinned min-label tie-break,
/root/reference/src/lib.rs:1446-1470 + SURVEY.md Q9): each flood claim at
level L makes the claimant adjacent to all its earlier-claimed neighbours,
so by the last level every within-component label pair has merged
transitively.  Component-min is therefore equivalent to iterating the
reference's find_merge/make_colour_map/recolour to exhaustion — but can be
computed with **segmented min-scans** instead of per-label union tables
(whose multi-million-entry scatter/gathers cost 170-400 ms at 4096² on TPU):

* a vertical pass replaces every maximal claimed run of each column by the
  run's min (one forward + one backward sweep, sequential in VMEM);
* a horizontal pass does the same along rows (transpose -> vertical pass ->
  transpose);
* alternate until a fixed point.  Each pass moves label information across
  an entire run — convergence takes O(staircase complexity of the
  components) passes (measured: 3-5 on dense random fields), not
  O(component diameter) stencil sweeps.

Edge rule: the reference only detects merge pairs through 3x3 windows
centred on interior pixels, so an adjacent pair of two *border* pixels never
merges (ops/merge.py, SURVEY.md §2 #5).  Exactly the vertical edges inside
columns {0, W-1} and the horizontal edges inside rows {0, H-1} connect two
border pixels; the driver restores those lines after each directional pass
(a directional scan never leaks values across columns/rows, so restoring
the line undoes every blocked-edge propagation).

UNCOLOURED (= 0) pixels are the segment barriers; labels are positive.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CHUNK = 512  # columns per grid step of the vertical scan kernel


def _vscan_kernel(lab_in, lab_out, *, h):
    """Per-column segmented min over claimed runs (fwd + bwd row sweep)."""
    lab_out[:] = lab_in[:]

    def fwd(i, _):
        prev = lab_out[pl.ds(i - 1, 1), :]
        cur = lab_out[pl.ds(i, 1), :]
        new = jnp.where(
            cur == 0,
            0,
            jnp.where(prev > 0, jnp.minimum(cur, prev), cur),
        )
        lab_out[pl.ds(i, 1), :] = new
        return 0

    jax.lax.fori_loop(1, h, fwd, 0)

    def bwd(k, _):
        i = h - 2 - k
        nxt = lab_out[pl.ds(i + 1, 1), :]
        cur = lab_out[pl.ds(i, 1), :]
        new = jnp.where(
            cur == 0,
            0,
            jnp.where(nxt > 0, jnp.minimum(cur, nxt), cur),
        )
        lab_out[pl.ds(i, 1), :] = new
        return 0

    jax.lax.fori_loop(0, h - 1, bwd, 0)


def _vscan_pallas(lab, *, interpret=False):
    h, w = lab.shape
    return pl.pallas_call(
        partial(_vscan_kernel, h=h),
        grid=(w // _CHUNK,),
        in_specs=[pl.BlockSpec((h, _CHUNK), lambda j: (0, j))],
        out_specs=pl.BlockSpec((h, _CHUNK), lambda j: (0, j)),
        out_shape=jax.ShapeDtypeStruct((h, w), jnp.int32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(lab)


def _vscan_jnp(lab):
    """Segmented run-min per column via associative scan (CPU fallback)."""
    big = jnp.int32(2**30)

    def combine(a, b):
        va, ra = a
        vb, rb = b
        return jnp.where(rb, vb, jnp.minimum(va, vb)), ra | rb

    def run_min(x, reverse):
        reset = x == 0
        y = jnp.where(reset, big, x)
        v, _ = jax.lax.associative_scan(
            combine, (y, reset), axis=0, reverse=reverse
        )
        return jnp.where(reset, 0, v)

    return run_min(run_min(lab, False), True)


def _pad_grid(lab):
    """Zero-pad to (8k, 512k) for the kernel grid; zeros are barriers."""
    h, w = lab.shape
    h2 = -(-h // 8) * 8
    w2 = -(-w // _CHUNK) * _CHUNK
    if (h2, w2) == (h, w):
        return lab, h, w
    out = jnp.zeros((h2, w2), dtype=lab.dtype)
    return jax.lax.dynamic_update_slice(out, lab, (0, 0)), h, w


def component_min_labels(labels, *, use_pallas: bool = True, interpret: bool = False):
    """Replace every 4-connected component of nonzero labels (blocked
    border-border edges excluded) by its minimum label.

    Bit-equivalent to iterating ops.merge.merge_touching to exhaustion; this
    is the merging variant's final-level output given segmenting labels.
    """
    labels = jnp.asarray(labels, dtype=jnp.int32)
    h, w = labels.shape

    def vscan(x):
        if use_pallas:
            xp, _, _ = _pad_grid(x)
            out = _vscan_pallas(xp, interpret=interpret)
            out = jax.lax.slice(out, (0, 0), (h, w))
        else:
            out = _vscan_jnp(x)
        # Blocked vertical edges: both endpoints in column 0 / W-1 are
        # border pixels.  The scan is per-column, so restoring the two
        # columns removes exactly those propagations.
        out = jax.lax.dynamic_update_slice(out, x[:, :1], (0, 0))
        out = jax.lax.dynamic_update_slice(out, x[:, -1:], (0, w - 1))
        return out

    def hscan(x):
        xt = vscan_t(x.T)
        return xt.T

    def vscan_t(xt):
        if use_pallas:
            xp, _, _ = _pad_grid(xt)
            out = _vscan_pallas(xp, interpret=interpret)
            out = jax.lax.slice(out, (0, 0), (w, h))
        else:
            out = _vscan_jnp(xt)
        # Blocked horizontal edges: rows 0 / H-1 become columns here.
        out = jax.lax.dynamic_update_slice(out, xt[:, :1], (0, 0))
        out = jax.lax.dynamic_update_slice(out, xt[:, -1:], (0, h - 1))
        return out

    def body(state):
        lab, _ = state
        new = hscan(vscan(lab))
        return new, jnp.any(new != lab)

    out, _ = jax.lax.while_loop(
        lambda s: s[1], body, (labels, jnp.bool_(True))
    )
    return out
