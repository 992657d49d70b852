"""The water-level sweep driver: the whole transform as one jitted program.

TPU-native restructuring of the reference's per-level loop
(/root/reference/src/lib.rs:1379-1521 merging, :1689-1807 segmenting):

* ``lax.fori_loop`` over water levels 0..=max_water_level,
* nested ``lax.while_loop`` flood fixed point (ops.flood),
* merge phase on-device (ops.merge) for the merging variant,
* per-level statistics accumulated into pre-allocated stacked arrays instead
  of host-side hook callbacks (``transform_to_list`` -> (levels, K+1) lake
  sizes; ``transform_history`` -> (levels, H, W) snapshots), so the fast path
  never leaves the device.

Per-level early exit: a level L > 0 at which no pixel has value exactly L is
skipped via ``lax.cond`` (see ops.histogram.value_histogram) — its flood fixed
point is immediate and no merge pairs can appear, so labels and statistics are
unchanged.  Level 0 always runs (seeds + ALWAYS_FILL pixels).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .flood import flood_fixed_point
from .histogram import lake_sizes, value_histogram
from .merge import merge_touching


def level_step(img, labels, lvl, *, merging: bool, n_labels: int, sweep_fn=None):
    """One complete water level: flood to fixed point (+ merge)."""
    labels = flood_fixed_point(img, labels, lvl, sweep_fn=sweep_fn)
    if merging:
        labels = merge_touching(labels, n_labels)
    return labels


@partial(
    jax.jit,
    static_argnames=("n_labels", "max_water_level", "merging", "collect", "sweep_fn"),
)
def run_levels(
    img,
    labels0,
    *,
    n_labels: int,
    max_water_level: int,
    merging: bool,
    collect: str = "none",
    sweep_fn=None,
):
    """Run the full transform.

    Args:
      img: (H, W) u8/int input image (cast to int32 internally).
      labels0: (H, W) int32 initial labels (seeds painted, 0 elsewhere).
      n_labels: number of seeds K (static; labels in 1..K).
      max_water_level: inclusive final level (1..=254).
      merging: merging (void-filling) variant if True, else segmenting.
      collect: 'none' | 'sizes' | 'history'
        * 'none'    -> returns final labels only.
        * 'sizes'   -> also (levels, K+1) per-level lake-size counts.
        * 'history' -> also (levels, H, W) per-level label snapshots.

    Returns final labels, or (final labels, collected stack).
    """
    img = jnp.asarray(img).astype(jnp.int32)
    labels0 = jnp.asarray(labels0, dtype=jnp.int32)
    levels = max_water_level + 1
    vhist = value_histogram(img)

    def step(labels, lvl):
        return level_step(
            img, labels, lvl, merging=merging, n_labels=n_labels, sweep_fn=sweep_fn
        )

    if collect == "none":

        def body(lvl, labels):
            return jax.lax.cond(
                (lvl == 0) | (vhist[lvl] > 0), lambda l: step(l, lvl), lambda l: l, labels
            )

        return jax.lax.fori_loop(0, levels, body, labels0)

    if collect == "sizes":
        out = jnp.zeros((levels, n_labels + 1), dtype=jnp.int32)

        def body(lvl, carry):
            labels, out = carry
            labels = jax.lax.cond(
                (lvl == 0) | (vhist[lvl] > 0), lambda l: step(l, lvl), lambda l: l, labels
            )
            out = out.at[lvl].set(lake_sizes(labels, n_labels))
            return labels, out

        return jax.lax.fori_loop(0, levels, body, (labels0, out))

    if collect == "history":
        out = jnp.zeros((levels,) + labels0.shape, dtype=jnp.int32)

        def body(lvl, carry):
            labels, out = carry
            labels = jax.lax.cond(
                (lvl == 0) | (vhist[lvl] > 0), lambda l: step(l, lvl), lambda l: l, labels
            )
            out = out.at[lvl].set(labels)
            return labels, out

        return jax.lax.fori_loop(0, levels, body, (labels0, out))

    raise ValueError(f"unknown collect mode {collect!r}")
