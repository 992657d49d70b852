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


_PB = 128  # prefix-sum block width (one MXU tile)


def _tri_incl() -> jnp.ndarray:
    r = jax.lax.broadcasted_iota(jnp.int32, (_PB, _PB), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (_PB, _PB), 1)
    return (r <= c).astype(jnp.float32)


def _row_prefix_incl(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive prefix sum along the last axis of a {0,1} array.

    Blocked MXU prefix: per-128 block prefixes are one small matmul (f32 dots
    of <= 128 ones — exact), block offsets a tiny int32 cumsum.  Integer-exact
    for ANY image size (a single w-wide f32 dot loses exactness past 2^24)
    and ~32x fewer FLOPs than a full (w, w) triangular matmul at 4096².
    """
    w = x.shape[-1]
    wp = -(-w // _PB) * _PB
    if wp != w:
        pad = [(0, 0)] * (x.ndim - 1) + [(0, wp - w)]
        x = jnp.pad(x, pad)
    xb = x.reshape(x.shape[:-1] + (wp // _PB, _PB)).astype(jnp.float32)
    # Precision.HIGHEST is load-bearing: TPU's DEFAULT matmul precision
    # truncates f32 inputs to bf16, which is integer-exact only to 256 — the
    # row-totals stage feeds values far beyond that (up to the image width),
    # and the truncation silently corrupted seed numbering at >= 2048^2 on
    # real TPU (caught by the fused Pallas pack kernel, ops/pallas_pack.py).
    # {0,1} mask inputs would be exact at any precision; row totals are not.
    local = jnp.dot(
        xb,
        _tri_incl(),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ).astype(jnp.int32)
    block_tot = local[..., -1]
    block_off = jnp.cumsum(block_tot, axis=-1) - block_tot  # exclusive, int32
    out = (local + block_off[..., None]).reshape(x.shape[:-1] + (wp,))
    return out[..., :w]


def seed_labels_from_mask(mask: jnp.ndarray) -> jnp.ndarray:
    """Label image with seeds numbered 1..K in row-major order, 0 elsewhere.

    Prefix sums run on the MXU (scans serialise on TPU: hundreds of ms for a
    4096² plane); see _row_prefix_incl for the blocked formulation.
    """
    m = mask.astype(jnp.int32)
    within = _row_prefix_incl(m)  # (.., h, w) per-row inclusive counts
    row_tot = within[..., -1]
    row_incl = _row_prefix_incl(row_tot)  # (.., h) inclusive over rows
    row_off = row_incl - row_tot  # exclusive
    ranks = within + row_off[..., None]
    return jnp.where(mask, ranks, jnp.int32(0))


def paint_seeds(shape: tuple[int, int], seeds) -> jnp.ndarray:
    """Label image from an explicit coordinate list (reference API shape).

    ``seeds`` is a sequence of (y, x); colours are 1..len(seeds) in list order
    (src/lib.rs:1358-1369).  Later seeds overwrite earlier ones at duplicate
    coordinates, like the reference's sequential paint loop (vectorised with
    an explicit keep-last dedup — a Python loop over a 4096² field's ~1.8M
    seeds costs minutes).
    """
    import numpy as np

    labels = np.zeros(shape, dtype=np.int32)
    coords = np.asarray(list(seeds), dtype=np.int64).reshape(-1, 2)
    if coords.shape[0]:
        flat = coords[:, 0] * shape[1] + coords[:, 1]
        # Last occurrence of each coordinate wins, like the sequential loop.
        rev_first = np.unique(flat[::-1], return_index=True)[1]
        keep = flat.shape[0] - 1 - rev_first
        cols = np.arange(1, flat.shape[0] + 1, dtype=np.int32)
        labels.reshape(-1)[flat[keep]] = cols[keep]
    return jnp.asarray(labels)
