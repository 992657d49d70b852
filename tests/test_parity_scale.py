"""Large-scale parity vs the native C++ oracle (VERDICT r1 weak #6).

Cross-checks the device engines at 1024²/254 levels and on plateau-heavy
(CGPS-like, low-dynamic-range) fields at full depth — where ring-order and
tie-break bugs hide — for both variants.  The scalar C++ oracle
(parity/oracle.cc) implements the reference's level-sweep semantics
(/root/reference/src/lib.rs:196-257, :1379-1521) with the pinned min-label
tie-break and runs 1024² in ~5 s.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from rustronomy_watershed_tpu.ops import paint_seeds, run_levels
from rustronomy_watershed_tpu.ops.merge_curve import relax_merging_sizes
from rustronomy_watershed_tpu.utils import fields

native = pytest.importorskip("rustronomy_watershed_tpu.parity.native")


def _grf_quantised(shape, levels, seed, power=-3.0):
    """Plateau-heavy field: a smooth GRF quantised to few levels."""
    g = fields.gaussian_random_field(shape, power=power, seed=seed)
    return np.clip(
        (g - g.min()) / (g.max() - g.min()) * (levels - 1), 0, levels - 1
    ).astype(np.uint8)


def _device(img, seeds, maxlvl, merging, backend, **kw):
    lab0 = paint_seeds(img.shape, seeds)
    return np.asarray(
        run_levels(
            jnp.asarray(img), lab0, n_labels=len(seeds),
            max_water_level=maxlvl, merging=merging, backend=backend, **kw,
        )
    )


@pytest.mark.parametrize("merging", [False, True])
def test_plateau_grf_1024_full_depth(merging):
    # 1024², 254 levels, quantised to 16 values -> plateaus thousands of
    # pixels deep; ring order (Q3) is fully exercised.
    img = _grf_quantised((1024, 1024), 16, seed=7)
    seeds = native.native_find_local_minima(img)
    want = native.native_transform(img, seeds, 254, merging=merging)
    got = _device(img, seeds, 254, merging, "relax")
    np.testing.assert_array_equal(got, want)


def test_uniform_1024_full_depth_segmenting():
    img = fields.uniform_field((1024, 1024), hi=254, seed=8)
    seeds = native.native_find_local_minima(img)
    want = native.native_transform(img, seeds, 254, merging=False)
    got = _device(img, seeds, 254, False, "relax")
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("merging", [False, True])
def test_nan_masked_preprocessed_512(merging):
    # NaN-heavy CGPS-like field through the Q4-faithful preprocessor:
    # NEVER_FILL(255) islands + ALWAYS_FILL(0) cells at full depth.
    base = fields.gaussian_random_field((512, 512), power=-2.5, seed=9)
    noisy = fields.nan_masked_field(base, frac=0.25, seed=9)
    from rustronomy_watershed_tpu.models.base import WatershedUtils

    img = WatershedUtils().pre_processor(noisy)
    seeds = native.native_find_local_minima(img)
    want = native.native_transform(img, seeds, 254, merging=merging)
    got = _device(img, seeds, 254, merging, "relax")
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("merging", [False, True])
def test_max_water_level_hit_mid_flood_512(merging):
    # max_water_level = 100 on a 254-valued field: the flood stops mid-way,
    # leaving a large unclaimed set (claim-clamp / masking parity).
    img = fields.uniform_field((512, 512), hi=254, seed=10)
    seeds = native.native_find_local_minima(img)
    want = native.native_transform(img, seeds, 100, merging=merging)
    got = _device(img, seeds, 100, merging, "relax")
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("merging", [False, True])
@pytest.mark.parametrize("backend", ["jnp", "pallas", "relax_pallas"])
def test_all_backends_vs_oracle_256(merging, backend):
    # Every backend at full depth on a plateau-heavy 256² field (the pallas
    # kernels run in interpret mode on CPU, so the size is kept moderate).
    img = _grf_quantised((256, 256), 12, seed=11)
    seeds = native.native_find_local_minima(img)
    want = native.native_transform(img, seeds, 254, merging=merging)
    got = _device(img, seeds, 254, merging, backend,
                  interpret=backend.endswith("pallas"))
    np.testing.assert_array_equal(got, want)


def test_merging_transform_to_list_vs_oracle_512():
    # VERDICT r1 'Done' criterion: merging per-level lake-size curves from
    # the relax engine bit-match the C++ oracle at 254 levels.
    img = _grf_quantised((512, 512), 16, seed=12)
    seeds = native.native_find_local_minima(img)
    _, want_sizes = native.native_transform(
        img, seeds, 254, merging=True, with_sizes=True
    )
    lab0 = paint_seeds(img.shape, seeds)
    final, sizes, _ = relax_merging_sizes(
        jnp.asarray(img), lab0, n_labels=len(seeds), max_water_level=254,
        backend="relax",
    )
    np.testing.assert_array_equal(np.asarray(sizes), want_sizes)
    want_lab = native.native_transform(img, seeds, 254, merging=True)
    np.testing.assert_array_equal(np.asarray(final), want_lab)
