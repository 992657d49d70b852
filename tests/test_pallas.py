"""Pallas kernel tests (interpret mode on CPU): the time-tiled, activity-gated
flood kernel must be bit-identical to iterated jnp sweeps and drivers."""

import jax.numpy as jnp
import numpy as np
import pytest

from rustronomy_watershed_tpu.ops import paint_seeds, run_levels
from rustronomy_watershed_tpu.ops.flood import flood_sweep
from rustronomy_watershed_tpu.ops.pallas_flood import (
    band_histogram,
    flood_block,
    gather_current,
    make_sweep_fn,
    pad_domain,
)


def _full_call(img, lab, lvl, tile, steps):
    img_p, lab_p = pad_domain(img, lab, tile, steps)
    gy = (img_p.shape[0] - 2 * steps) // tile
    ones = jnp.ones((gy,), jnp.int32)
    zeros = jnp.zeros((gy,), jnp.int32)
    a, b, flags, chg = flood_block(
        img_p, lab_p, lab_p * 1, lvl, ones, zeros,
        tile=tile, steps=steps, interpret=True,
    )
    return gather_current(a, b, flags, tile=tile, steps=steps), flags, chg


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

    plane, _, _ = _full_call(img, lab, 10, tile, steps)
    got = np.asarray(plane)[steps : steps + h, steps : steps + w]
    np.testing.assert_array_equal(got, want)


def test_flood_block_flags_and_convergence(rng):
    h = w = 24
    img = np.full((h, w), 200, dtype=np.uint8)
    # Converged input -> all flags 0, not_converged False in one call.
    lab = np.zeros((h, w), np.int32)
    lab[1:-1, 1:-1] = 1
    plane, flags, chg = _full_call(img, lab, 254, 8, 8)
    assert not bool(chg)
    assert not np.asarray(flags).any()
    # Unconverged (long corridor) -> flag set where painting happened.
    lab2 = np.zeros((h, w), np.int32)
    lab2[1, 1] = 1
    plane2, flags2, chg2 = _full_call(img, lab2, 254, 8, 8)
    assert bool(chg2)
    assert np.asarray(flags2)[0] == 1


def test_inactive_bands_do_not_change(rng):
    # With an empty active set the call must be a no-op with False flags.
    h = w = 32
    img = rng.integers(0, 20, size=(h, w)).astype(np.uint8)
    lab = np.asarray(paint_seeds((h, w), [(5, 5)]))
    img_p, lab_p = pad_domain(img, lab, 8, 8)
    gy = (img_p.shape[0] - 16) // 8
    zeros = jnp.zeros((gy,), jnp.int32)
    a, b, flags, chg = flood_block(
        img_p, lab_p, lab_p * 1, 254, zeros, zeros,
        tile=8, steps=8, interpret=True,
    )
    assert not bool(chg) and not np.asarray(flags).any()
    np.testing.assert_array_equal(np.asarray(a), np.asarray(lab_p))


def test_band_histogram(rng):
    img = rng.integers(0, 16, size=(20, 10)).astype(np.uint8)
    bh = np.asarray(band_histogram(img, tile=8))
    assert bh.shape == (3, 256)
    np.testing.assert_array_equal(bh[0, :16], np.bincount(img[:8].reshape(-1), minlength=16))
    np.testing.assert_array_equal(bh[1, :16], np.bincount(img[8:16].reshape(-1), minlength=16))
    # alignment padding rows counted as NEVER_FILL only
    assert bh[2, :16].sum() == img[16:].size


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


@pytest.mark.parametrize(
    "shape,tile,steps",
    [((64, 64), 64, 16), ((100, 75), 256, 16), ((256, 300), 64, 8), ((41, 17), 8, 8)],
)
def test_fused_pack_matches_jnp_pipeline(rng, shape, tile, steps):
    # The fused pack kernel (ops.pallas_pack) must reproduce
    # pack_domain(img, seed_labels_from_mask(local_extrema_mask(img)))
    # bit-exactly, including the row-major seed numbering (this kernel is the
    # independent check that caught the TPU bf16-truncation numbering bug in
    # the jnp MXU prefix — see ops/seeds.py).
    from rustronomy_watershed_tpu.ops.pallas_pack import pack_domain_fused
    from rustronomy_watershed_tpu.ops.pallas_relax import pack_domain
    from rustronomy_watershed_tpu.ops.seeds import (
        local_extrema_mask,
        seed_labels_from_mask,
    )

    img = rng.integers(0, 255, size=shape).astype(np.uint8)
    lab0 = seed_labels_from_mask(local_extrema_mask(jnp.asarray(img)))
    v0, k0, l0 = pack_domain(img, lab0, tile, steps)
    v1, k1, l1, n = pack_domain_fused(img, tile, steps, interpret=True)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v0))
    np.testing.assert_array_equal(np.asarray(k1), np.asarray(k0))
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l0))
    assert int(n) == int(np.asarray(lab0).max())


def test_e2e_fused_pack_matches_jnp_e2e(rng):
    # watershed_e2e_impl(backend='relax_pallas') routes through the fused
    # pack (labels0=None) — must match the jnp-backend e2e bit-exactly.
    from functools import partial

    import jax

    from rustronomy_watershed_tpu.ops.pipeline import watershed_e2e_impl

    img = rng.integers(0, 60, size=(48, 56)).astype(np.uint8)
    f = lambda backend: np.asarray(
        jax.jit(
            partial(
                watershed_e2e_impl,
                max_water_level=59,
                backend=backend,
                interpret=True,
            )
        )(jnp.asarray(img))
    )
    np.testing.assert_array_equal(f("relax_pallas"), f("jnp"))


def test_pipelined_dense_kernel_matches_sparse(rng):
    h, w = 40, 52
    img = rng.integers(0, 20, size=(h, w)).astype(np.uint8)
    seeds = [(5, 5), (30, 33), (17, 22), (1, 1)]
    lab = np.asarray(paint_seeds((h, w), seeds))
    img_p, lab_p = pad_domain(img, lab, 8, 8)
    gy = (img_p.shape[0] - 16) // 8
    ones = jnp.ones((gy,), jnp.int32)
    zeros = jnp.zeros((gy,), jnp.int32)
    outs = {}
    for pipelined in (False, True):
        a, b, flags, chg = flood_block(
            img_p, lab_p, lab_p * 1, 10, ones, zeros,
            tile=8, steps=8, interpret=True, pipelined=pipelined,
        )
        outs[pipelined] = (
            np.asarray(gather_current(a, b, flags, tile=8, steps=8)),
            np.asarray(flags),
            bool(chg),
        )
    np.testing.assert_array_equal(outs[False][0], outs[True][0])
    np.testing.assert_array_equal(outs[False][1], outs[True][1])
    assert outs[False][2] == outs[True][2]
