"""Single-component merging shortcut: trigger conditions + bit-parity.

At full depth on an image with no unclaimed interior pixel and no claimed
border pixel, the claimed set is the whole interior rectangle — one
4-connected component — so the merged labels are a broadcast of the global
minimum label (ops.level_driver).  These tests pin that the shortcut
(a) actually triggers on the dense-field workload, (b) is bit-identical to
the general scan tail, and (c) stays OFF for the input classes it cannot
serve (interior NEVER_FILL barriers, border seeds), which must still give
scan-tail results.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from rustronomy_watershed_tpu.constants import NEVER_FILL
from rustronomy_watershed_tpu.ops.level_driver import run_levels_impl
from rustronomy_watershed_tpu.ops.pallas_relax import relax_packed_planes
from rustronomy_watershed_tpu.ops.seeds import (
    local_extrema_mask,
    seed_labels_from_mask,
)


def _merging_both_backends(img, lab0, n):
    got = run_levels_impl(
        img, lab0, n_labels=n, max_water_level=254, merging=True,
        backend="relax_pallas", interpret=True,
    )
    want = run_levels_impl(
        img, lab0, n_labels=n, max_water_level=254, merging=True,
        backend="jnp",
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    return got


def _mstats(img, lab0, **kw):
    out = relax_packed_planes(img, lab0, interpret=True, fwd_scan=True, **kw)
    _, _, _, _, _, _, y0_valid, mstats, _ = out
    any_izero, any_border, gmin = mstats
    return bool(y0_valid), bool(any_izero), bool(any_border), int(gmin)


def test_shortcut_triggers_and_matches_on_dense_field(rng):
    img = rng.integers(0, 254, (64, 96)).astype(np.uint8)
    lab0 = np.asarray(
        seed_labels_from_mask(local_extrema_mask(jnp.asarray(img, jnp.int32)))
    )
    n = int(lab0.max())
    valid, izero, border, gmin = _mstats(img, lab0, steps=64)
    assert valid and not izero and not border
    assert gmin == 1  # row-major numbering: label 1 is the global min
    merged = _merging_both_backends(img, lab0, n)
    inner = np.asarray(merged)[1:-1, 1:-1]
    assert (inner == 1).all()  # the broadcast itself


def test_interior_barriers_disable_shortcut(rng):
    """A NEVER_FILL blob in the interior splits the claimed set — the
    shortcut must stay off and the scan tail must produce the (multi-
    component) reference labels."""
    img = rng.integers(0, 200, (64, 96)).astype(np.uint8)
    img[20:44, 40:44] = NEVER_FILL  # a wall splitting the domain
    lab0 = np.asarray(
        seed_labels_from_mask(local_extrema_mask(jnp.asarray(img, jnp.int32)))
    )
    n = int(lab0.max())
    _, izero, _, _ = _mstats(img, lab0, steps=64)
    assert izero
    merged = np.asarray(_merging_both_backends(img, lab0, n))
    # the wall really does keep at least two components apart
    assert len(np.unique(merged[1:-1, 1:-1])) > 1


def test_border_seed_disables_shortcut(rng):
    """A claimed border pixel merges horizontally only (quirk semantics the
    broadcast cannot reproduce) — shortcut off, outputs still parity."""
    img = rng.integers(0, 254, (48, 64)).astype(np.uint8)
    lab0 = np.array(
        seed_labels_from_mask(local_extrema_mask(jnp.asarray(img, jnp.int32)))
    )
    lab0[0, 10] = int(lab0.max()) + 1  # inject a border seed
    n = int(lab0.max())
    _, _, border, _ = _mstats(img, lab0, steps=48)
    assert border
    _merging_both_backends(img, lab0, n)


def test_empty_interior_guard(rng):
    """2-row images have no interior: gmin stays at INF and the shortcut
    must not trigger (the scan tail handles the degenerate geometry)."""
    img = rng.integers(0, 254, (2, 64)).astype(np.uint8)
    lab0 = np.zeros((2, 64), np.int32)
    valid, izero, border, gmin = _mstats(img, lab0, steps=8)
    from rustronomy_watershed_tpu.ops.scan_merge import _INF

    assert gmin == _INF
