"""Integration matrix, modelled on the reference's tests/integration.rs:
{merging, segmenting} x {uniform random, Poisson, Gaussian random field,
NaN-heavy} — upgraded from the reference's assertion-free smoke runs to
label-parity assertions against the native C++ oracle, plus plot output.

Real CGPS FITS slices are exercised when astropy + WSRS_DATA_PATH are
available (the reference's fixture convention, integration.rs:41-48);
otherwise the synthetic fields cover the same code paths.
"""

import numpy as np
import pytest

from rustronomy_watershed_tpu import TransformBuilder
from rustronomy_watershed_tpu.utils import fields

native = pytest.importorskip("rustronomy_watershed_tpu.parity.native")

SIZE = (48, 48)
MAXLVL = 40


def _check(img_u8, merging):
    ws = TransformBuilder.default().set_max_water_lvl(MAXLVL)
    ws = ws.build_merging() if merging else ws.build_segmenting()
    seeds = ws.find_local_minima(img_u8)
    got = ws.transform(img_u8, seeds)
    want = native.native_transform(img_u8, seeds, MAXLVL, merging=merging)
    np.testing.assert_array_equal(got, want)
    return got, seeds


@pytest.mark.parametrize("merging", [False, True])
def test_uniform_random_field(merging):
    img = fields.uniform_field(SIZE, hi=MAXLVL + 2, seed=1)
    _check(img, merging)


@pytest.mark.parametrize("merging", [False, True])
def test_poisson_field(merging):
    ws = TransformBuilder.default().build_segmenting()
    img = ws.pre_processor_with_max(fields.poisson_field(SIZE, lam=20.0, seed=2), MAXLVL)
    _check(img, merging)


@pytest.mark.parametrize("merging", [False, True])
def test_gaussian_random_field(merging):
    ws = TransformBuilder.default().build_segmenting()
    img = ws.pre_processor_with_max(
        fields.gaussian_random_field(SIZE, power=-3.0, seed=3), MAXLVL
    )
    _check(img, merging)


@pytest.mark.parametrize("merging", [False, True])
def test_nan_heavy_field(merging):
    base = fields.gaussian_random_field(SIZE, power=-2.5, seed=4)
    noisy = fields.nan_masked_field(base, frac=0.25, seed=4)
    ws = TransformBuilder.default().build_segmenting()
    img = ws.pre_processor_with_max(noisy, MAXLVL)
    # NaNs map to NEVER_FILL (Q4) and must survive the whole transform
    labels, seeds = _check(img, merging)
    never = img == 255
    never_seeds = np.zeros_like(never)
    for y, x in seeds:
        never_seeds[y, x] = True
    assert (labels[never & ~never_seeds] == 0).all()


def test_fits_slice_if_available(tmp_path):
    data = fields.load_fits_slice()
    if data is None:
        pytest.skip("astropy / WSRS_DATA_PATH not available")
    ws = TransformBuilder.default().set_max_water_lvl(MAXLVL).build_merging()
    img = ws.pre_processor_with_max(data[:64, :64], MAXLVL)
    _check(img, merging=True)


def test_full_run_with_plots(tmp_path):
    img = fields.uniform_field((24, 24), hi=8, seed=5)
    ws = (
        TransformBuilder.default()
        .set_max_water_lvl(6)
        .set_plot_folder(tmp_path)
        .build_merging()
    )
    ws.transform_with_hook(img, ws.find_local_minima(img))
    assert len(list(tmp_path.glob("ws_lvl*.png"))) == 7
