"""On-device transform diagnostics.

BASELINE config 4 reports "single-chip throughput + fixed-point iteration
count"; this module counts the per-level Jacobi-sweep fixed-point iterations
(the reference's `loops` PerfReport counter, src/lib.rs:1400-1402) for a whole
transform in one jitted program.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .flood import flood_sweep
from .histogram import value_histogram
from .merge import merge_touching
from .seeds import local_extrema_mask, seed_labels_from_mask


@partial(jax.jit, static_argnames=("max_water_level", "merging", "n_labels"))
def count_fixed_point_iterations(
    img, labels0=None, *, max_water_level: int = 254, merging: bool = False,
    n_labels: int | None = None,
):
    """Returns (total_sweeps, max_sweeps_per_level, per_level_counts).

    ``labels0`` defaults to reference-semantics seeds from the image itself.
    """
    img = jnp.asarray(img).astype(jnp.int32)
    if labels0 is None:
        labels0 = seed_labels_from_mask(local_extrema_mask(img))
        if n_labels is None:
            h, w = img.shape
            n_labels = max(1, ((h - 1) // 2) * ((w - 1) // 2))
    labels0 = jnp.asarray(labels0, dtype=jnp.int32)
    levels = max_water_level + 1
    vhist = value_histogram(img)

    def level(lvl, carry):
        lab, counts = carry

        def run(lab):
            def body(state):
                l, _, c = state
                new = flood_sweep(img, l, lvl)
                return new, jnp.any(new != l), c + 1

            lab, _, c = jax.lax.while_loop(
                lambda s: s[1], body, (lab, jnp.bool_(True), jnp.int32(0))
            )
            if merging:
                lab = merge_touching(lab, n_labels)
            return lab, c

        lab, c = jax.lax.cond(
            (lvl == 0) | (vhist[lvl] > 0),
            run,
            lambda l: (l, jnp.int32(0)),
            lab,
        )
        return lab, counts.at[lvl].set(c)

    _, counts = jax.lax.fori_loop(
        0, levels, level, (labels0, jnp.zeros((levels,), jnp.int32))
    )
    return jnp.sum(counts), jnp.max(counts), counts
