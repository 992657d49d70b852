"""On-device lake-size histograms.

Replaces the reference's serial per-level histogram ``find_lake_sizes``
(/root/reference/src/lib.rs:628-635) with a scatter-add (bincount) that runs
inside the jitted level loop.

Parity note (SURVEY.md Q10): the reference allocates ``n_pixels + 1`` counters
per level despite labels never exceeding ``n_seeds``; index 0 counts
UNCOLOURED pixels.  The device kernel uses ``n_labels + 1`` counters (all
nonzero information lives there); the host API expands to the reference's
length on request.
"""

from __future__ import annotations

import jax.numpy as jnp


def lake_sizes(labels: jnp.ndarray, n_labels: int) -> jnp.ndarray:
    """Counts of each label value 0..n_labels over the image (int32)."""
    counts = jnp.zeros((n_labels + 1,), dtype=jnp.int32)
    ones = jnp.ones(labels.size, dtype=jnp.int32)
    return counts.at[labels.reshape(-1)].add(ones, mode="drop")


def value_histogram(img: jnp.ndarray) -> jnp.ndarray:
    """256-bin histogram of the u8 input — used for per-level early exit:
    a water level L > 0 with no pixel of value exactly L cannot change the
    label image (the frontier at the previous level's fixed point is blocked
    by pixels of value >= L; only value == L opens new paths)."""
    counts = jnp.zeros((256,), dtype=jnp.int32)
    ones = jnp.ones(img.size, dtype=jnp.int32)
    return counts.at[img.reshape(-1).astype(jnp.int32)].add(ones, mode="drop")
