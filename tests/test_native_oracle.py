"""Native C++ oracle: must agree with the NumPy oracle and the device path."""

import numpy as np
import jax.numpy as jnp
import pytest

from rustronomy_watershed_tpu.ops import paint_seeds, run_levels
from rustronomy_watershed_tpu.parity import oracle_find_local_minima, oracle_transform

native = pytest.importorskip("rustronomy_watershed_tpu.parity.native")


@pytest.mark.parametrize("merging", [False, True])
def test_native_matches_numpy_oracle(rng, merging):
    img = rng.integers(0, 14, size=(18, 22)).astype(np.uint8)
    seeds = oracle_find_local_minima(img)
    want, _ = oracle_transform(img, seeds, 12, merging=merging)
    got = native.native_transform(img, seeds, 12, merging=merging)
    np.testing.assert_array_equal(got, want)


def test_native_matches_numpy_oracle_edge_correction(rng):
    img = rng.integers(0, 14, size=(16, 16)).astype(np.uint8)
    seeds = [(4, 4), (10, 12)]
    want, _ = oracle_transform(img, seeds, 10, merging=True, edge_correction=True)
    got = native.native_transform(img, seeds, 10, merging=True, edge_correction=True)
    np.testing.assert_array_equal(got, want)


def test_native_find_local_minima(rng):
    img = rng.integers(0, 50, size=(24, 24)).astype(np.uint8)
    assert native.native_find_local_minima(img) == oracle_find_local_minima(img)


@pytest.mark.parametrize("merging", [False, True])
def test_device_matches_native_oracle_larger_field(rng, merging):
    # The native oracle is fast enough to cross-check the device path at a
    # size the NumPy oracle cannot reach in test time.
    img = rng.integers(0, 254, size=(96, 96)).astype(np.uint8)
    seeds = native.native_find_local_minima(img)
    lab0 = paint_seeds(img.shape, seeds)
    got = np.asarray(
        run_levels(jnp.asarray(img), lab0, n_labels=len(seeds),
                   max_water_level=254, merging=merging)
    )
    want = native.native_transform(img, seeds, 254, merging=merging)
    np.testing.assert_array_equal(got, want)


def test_native_sizes(rng):
    img = rng.integers(0, 10, size=(20, 20)).astype(np.uint8)
    seeds = native.native_find_local_minima(img)
    labels, sizes = native.native_transform(img, seeds, 8, merging=True, with_sizes=True)
    assert sizes.shape == (9, len(seeds) + 1)
    np.testing.assert_array_equal(
        sizes[-1], np.bincount(labels.reshape(-1), minlength=len(seeds) + 1)
    )
    assert (sizes.sum(axis=1) == img.size).all()


def test_heap_oracle_matches_native(rng):
    # Third independent implementation (event-driven heap claiming,
    # parity/heap_oracle.py) vs the C++ level-sweep oracle: agreement pins
    # the semantics, not a shared reading.
    from rustronomy_watershed_tpu.parity.heap_oracle import (
        heap_find_local_minima,
        heap_transform,
    )

    img = rng.integers(0, 20, size=(28, 32)).astype(np.uint8)
    seeds = native.native_find_local_minima(img)
    assert seeds == heap_find_local_minima(img)
    for merging in (False, True):
        want, wsz = native.native_transform(img, seeds, 254, merging=merging, with_sizes=True)
        got, gsz = heap_transform(img, seeds, 254, merging=merging, with_sizes=True)
        np.testing.assert_array_equal(got, want)
        np.testing.assert_array_equal(gsz, wsz)
