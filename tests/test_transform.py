"""End-to-end parity tests: device transforms vs the independent host oracle.

The reference's integration tests are assertion-free smoke runs
(/root/reference/tests/integration.rs); here they are upgraded to label-parity
assertions (SURVEY.md §4) against ``parity.oracle`` — a from-scratch NumPy
implementation of the reference semantics under the pinned min-label
tie-break.
"""

import numpy as np
import pytest

from rustronomy_watershed_tpu import TransformBuilder
from rustronomy_watershed_tpu.parity import oracle_find_local_minima, oracle_transform

MAXLVL = 12


def _random_field(rng, shape=(20, 20), hi=MAXLVL + 2):
    return rng.integers(0, hi, size=shape).astype(np.uint8)


@pytest.mark.parametrize("merging", [False, True])
@pytest.mark.parametrize("edge_correction", [False, True])
def test_transform_parity_random_field(rng, merging, edge_correction):
    img = _random_field(rng)
    builder = TransformBuilder.default().set_max_water_lvl(MAXLVL)
    if edge_correction:
        builder = builder.enable_edge_correction()
    ws = builder.build_merging() if merging else builder.build_segmenting()

    seeds = ws.find_local_minima(img)
    assert seeds == oracle_find_local_minima(img)
    assert len(seeds) > 0

    got = ws.transform(img, seeds)
    want, _ = oracle_transform(
        img, seeds, MAXLVL, merging=merging, edge_correction=edge_correction
    )
    assert got.shape == want.shape  # padded shape kept under edge correction (Q7)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("merging", [False, True])
def test_history_parity_per_level(rng, merging):
    img = _random_field(rng, shape=(14, 14))
    ws = TransformBuilder.default().set_max_water_lvl(MAXLVL)
    ws = ws.build_merging() if merging else ws.build_segmenting()
    seeds = ws.find_local_minima(img)
    hist = ws.transform_history(img, seeds)
    _, want_hist = oracle_transform(img, seeds, MAXLVL, merging=merging)
    assert len(hist) == MAXLVL + 1
    for (lvl, snap), want in zip(hist, want_hist):
        np.testing.assert_array_equal(snap, want, err_msg=f"level {lvl}")


@pytest.mark.parametrize("merging", [False, True])
def test_to_list_parity(rng, merging):
    img = _random_field(rng, shape=(14, 14))
    ws = TransformBuilder.default().set_max_water_lvl(MAXLVL)
    ws = ws.build_merging() if merging else ws.build_segmenting()
    seeds = ws.find_local_minima(img)
    out = ws.transform_to_list(img, seeds)
    _, want_hist = oracle_transform(img, seeds, MAXLVL, merging=merging)
    # Reference vector length: n_pixels + 1 (Q10), index 0 = uncoloured count.
    assert len(out) == MAXLVL + 1
    for (lvl, counts), want in zip(out, want_hist):
        assert len(counts) == img.size + 1
        expect = np.bincount(want.reshape(-1), minlength=img.size + 1)
        np.testing.assert_array_equal(counts, expect, err_msg=f"level {lvl}")


def test_determinism(rng):
    img = _random_field(rng)
    ws = TransformBuilder.default().set_max_water_lvl(MAXLVL).build_segmenting()
    seeds = ws.find_local_minima(img)
    a = ws.transform(img, seeds)
    b = ws.transform(img, seeds)
    np.testing.assert_array_equal(a, b)


def test_merging_single_lake_at_top(rng):
    # On a field with max value <= max level and a percolating flood, the
    # merging transform ends with one lake (plus the unreachable 1-px border).
    img = _random_field(rng, shape=(16, 16), hi=MAXLVL)
    ws = TransformBuilder.default().set_max_water_lvl(MAXLVL).build_merging()
    seeds = ws.find_local_minima(img)
    out = ws.transform(img, seeds)
    interior = out[1:-1, 1:-1]
    assert set(np.unique(interior)) == {1}


def test_never_fill_pixels_stay_uncoloured(rng):
    img = _random_field(rng, shape=(12, 12), hi=10)
    img[5, 5] = 255  # NEVER_FILL
    img[6, 5] = 255
    ws = TransformBuilder.default().set_max_water_lvl(254).build_segmenting()
    seeds = [(2, 2)]
    out = ws.transform(img, seeds)
    assert out[5, 5] == 0 and out[6, 5] == 0
    # everything else interior flooded
    inner = out[1:-1, 1:-1]
    assert (inner == 0).sum() == 2


def test_edge_correction_floods_original_border(rng):
    # Edge correction pads with ALWAYS_FILL zeros so the *original* border
    # pixels become paintable interior pixels; the padding ring itself is the
    # new border and stays uncoloured, and the output keeps the padded shape
    # (Q7 replication).
    img = np.full((8, 8), 3, dtype=np.uint8)
    img[4, 4] = 0
    ws = (
        TransformBuilder.default()
        .set_max_water_lvl(5)
        .enable_edge_correction()
        .build_segmenting()
    )
    out = ws.transform(img, [(4, 4)])  # seed coordinate NOT shifted (Q7)
    assert out.shape == (10, 10)
    assert (out[1:-1, 1:-1] == 1).all()  # every original pixel claimed
    assert (out[0] == 0).all() and (out[-1] == 0).all()
    # Without edge correction the original border would stay uncoloured.
    ws2 = TransformBuilder.default().set_max_water_lvl(5).build_segmenting()
    out2 = ws2.transform(img, [(4, 4)])
    assert (out2[0] == 0).all() and (out2[1:-1, 1:-1] == 1).all()
