"""Pallas kernel tests (interpret mode on CPU): the time-tiled flood kernel
must be bit-identical to iterated jnp sweeps and to the jnp full driver."""

import jax.numpy as jnp
import numpy as np
import pytest

from rustronomy_watershed_tpu.ops import paint_seeds, run_levels
from rustronomy_watershed_tpu.ops.flood import flood_sweep
from rustronomy_watershed_tpu.ops.pallas_flood import (
    flood_block,
    make_sweep_fn,
    pad_domain,
)


@pytest.mark.parametrize("tile,steps", [(16, 8), (8, 8)])
def test_flood_block_equals_k_jnp_sweeps(rng, tile, steps):
    h, w = 40, 52
    img = rng.integers(0, 20, size=(h, w)).astype(np.uint8)
    seeds = [(5, 5), (30, 33), (17, 22), (1, 1), (0, 7), (39, 51)]
    lab = np.asarray(paint_seeds((h, w), seeds))

    want = jnp.asarray(lab)
    for _ in range(steps):
        want = flood_sweep(jnp.asarray(img).astype(jnp.int32), want, 10)
    want = np.asarray(want)

    img_p, lab_p = pad_domain(img, lab, tile, steps)
    new, _ = flood_block(img_p, lab_p, 10, tile=tile, steps=steps, interpret=True)
    got = np.asarray(new)[steps : steps + h, steps : steps + w]
    np.testing.assert_array_equal(got, want)


def test_flood_block_convergence_flag(rng):
    # Converged input -> flag False in one call (the last-sweep witness).
    h = w = 24
    img = np.full((h, w), 200, dtype=np.uint8)
    lab = np.zeros((h, w), np.int32)
    lab[1:-1, 1:-1] = 1  # fully flooded interior
    img_p, lab_p = pad_domain(img, lab, 8, 8)
    new, flag = flood_block(img_p, lab_p, 254, tile=8, steps=8, interpret=True)
    assert not bool(flag)
    # Unconverged input (long corridor) -> flag True.
    lab2 = np.zeros((h, w), np.int32)
    lab2[1, 1] = 1
    _, flag2 = flood_block(img_p, jnp.asarray(pad_domain(img, lab2, 8, 8)[1]), 254,
                           tile=8, steps=8, interpret=True)
    assert bool(flag2)


@pytest.mark.parametrize("merging", [False, True])
def test_pallas_driver_matches_jnp_driver(rng, merging):
    h, w = 30, 34
    img = rng.integers(0, 12, size=(h, w)).astype(np.uint8)
    seeds = [(3, 3), (20, 28), (15, 9)]
    lab0 = paint_seeds((h, w), seeds)
    want = np.asarray(
        run_levels(jnp.asarray(img), lab0, n_labels=3, max_water_level=10,
                   merging=merging)
    )
    got = np.asarray(
        run_levels(jnp.asarray(img), lab0, n_labels=3, max_water_level=10,
                   merging=merging, backend="pallas", tile=8, steps=8,
                   interpret=True)
    )
    np.testing.assert_array_equal(got, want)


def test_pallas_sweep_fn_dropin(rng):
    h, w = 26, 30
    img = rng.integers(0, 10, size=(h, w)).astype(np.uint8)
    lab = paint_seeds((h, w), [(4, 4), (20, 20)])
    sw = make_sweep_fn(8, 8, interpret=True)
    want = np.asarray(
        run_levels(jnp.asarray(img), lab, n_labels=2, max_water_level=8, merging=False)
    )
    got = np.asarray(
        run_levels(jnp.asarray(img), lab, n_labels=2, max_water_level=8,
                   merging=False, sweep_fn=sw)
    )
    np.testing.assert_array_equal(got, want)
