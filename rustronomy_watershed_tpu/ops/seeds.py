"""Seed finding: the reference's ``find_local_minima``.

Faithfully replicates the reference *code* (not its docs): a pixel is a seed
iff **all eight** 8-connected neighbours are **strictly less** than the centre
(/root/reference/src/lib.rs:1190) — i.e. strict local *maxima*, despite the
function name (SURVEY.md Q1).  Border pixels are never candidates (3x3 window
centres only), and plateaus (any equal neighbour) never seed.

Two entry points:

* ``local_extrema_mask`` — jittable boolean mask (fixed shape).
* ``seed_labels_from_mask`` — jittable conversion of the mask into a label
  image with labels ``1..K`` assigned in row-major order, which matches the
  reference's enumeration order of ``find_local_minima`` output (rayon's
  indexed collect preserves row-major window order) and the seed-painting loop
  at src/lib.rs:1358-1369.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .stencil import interior_mask, roll8


def local_extrema_mask(img: jnp.ndarray, mode: str = "reference") -> jnp.ndarray:
    """Mask of seed pixels.

    ``mode='reference'`` (default) keeps the reference's quirk: strict local
    maxima (all 8 neighbours < centre).  ``mode='minima'`` implements the
    documented intent (all 8 neighbours > centre) for users who want true
    minima seeding.
    """
    neigh = roll8(img)
    if mode == "reference":
        ok = neigh[0] < img
        for n in neigh[1:]:
            ok &= n < img
    elif mode == "minima":
        ok = neigh[0] > img
        for n in neigh[1:]:
            ok &= n > img
    else:
        raise ValueError(f"unknown mode {mode!r}")
    return ok & interior_mask(img.shape[-2:])


def seed_labels_from_mask(mask: jnp.ndarray) -> jnp.ndarray:
    """Label image with seeds numbered 1..K in row-major order, 0 elsewhere.

    Prefix sums run on the MXU: scans (jnp.cumsum) serialise on TPU (hundreds
    of ms for a 4096² plane), while ``mask @ triangular_ones`` is one matmul.
    f32 accumulation is integer-exact here (counts <= H*W < 2^24 per dot).
    """
    h, w = mask.shape[-2], mask.shape[-1]
    m = mask.astype(jnp.float32)
    rows_idx = jax.lax.broadcasted_iota(jnp.int32, (w, w), 0)
    cols_idx = jax.lax.broadcasted_iota(jnp.int32, (w, w), 1)
    incl_tri = (rows_idx <= cols_idx).astype(jnp.float32)  # k <= j
    within = jnp.dot(m, incl_tri, preferred_element_type=jnp.float32)
    row_tot = within[..., -1]
    r1 = jax.lax.broadcasted_iota(jnp.int32, (h, h), 0)
    c1 = jax.lax.broadcasted_iota(jnp.int32, (h, h), 1)
    strict_tri = (r1 < c1).astype(jnp.float32)  # k < i
    row_off = jnp.dot(row_tot, strict_tri, preferred_element_type=jnp.float32)
    ranks = (within + row_off[..., None]).astype(jnp.int32)
    return jnp.where(mask, ranks, jnp.int32(0))


def paint_seeds(shape: tuple[int, int], seeds) -> jnp.ndarray:
    """Label image from an explicit coordinate list (reference API shape).

    ``seeds`` is a sequence of (y, x); colours are 1..len(seeds) in list order
    (src/lib.rs:1358-1369).  Later seeds overwrite earlier ones at duplicate
    coordinates, like the reference's sequential paint loop.
    """
    import numpy as np

    labels = np.zeros(shape, dtype=np.int32)
    for col, (y, x) in enumerate(seeds, start=1):
        labels[y, x] = col
    return jnp.asarray(labels)
