"""Golden unit tests of the core kernels.

Fixtures and expected values are ports of the reference's inline ``#[test]``s
(/root/reference/src/lib.rs:259-291 test_find_px, :447-465 test_find_merge,
:544-587 test_make_colour_map, :594-626 test_recolour) — the test *data* is
the behavioural spec the kernels must match.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from rustronomy_watershed_tpu import UNCOLOURED
from rustronomy_watershed_tpu.ops import (
    flood_fixed_point,
    flood_sweep,
    lake_sizes,
    local_extrema_mask,
    merge_touching,
    paint_seeds,
    pre_process,
    recolour,
    resolve_merges,
    seed_labels_from_mask,
    touching_pairs,
    value_histogram,
)

FIND_PX_IMG = np.array(
    [
        [0, 0, 0, 0, 0, 0, 0, 0],
        [0, 0, 0, 0, 0, 1, 0, 0],
        [0, 0, 1, 0, 0, 0, 0, 0],
        [0, 0, 0, 0, 0, 5, 0, 0],
        [0, 0, 0, 1, 0, 0, 0, 0],
        [0, 0, 0, 5, 0, 0, 1, 0],
        [0, 0, 5, 4, 5, 0, 0, 0],
        [0, 0, 0, 5, 0, 0, 0, 0],
    ],
    dtype=np.int32,
)
FIND_PX_COLOURS = np.array(
    [
        [0, 0, 0, 0, 0, 0, 0, 0],
        [0, 1, 1, 1, 1, 0, 1, 0],
        [0, 1, 0, 1, 1, 1, 1, 0],
        [0, 1, 1, 1, 1, 0, 1, 0],
        [0, 1, 1, 1, 0, 0, 1, 0],
        [0, 1, 1, 0, 1, 1, 0, 0],
        [0, 1, 0, 0, 0, 1, 1, 0],
        [0, 0, 0, 0, 0, 0, 0, 0],
    ],
    dtype=np.int32,
)


def test_flood_sweep_golden():
    assert UNCOLOURED == 0
    new = np.asarray(flood_sweep(jnp.asarray(FIND_PX_IMG), jnp.asarray(FIND_PX_COLOURS), 2))
    painted = {tuple(c) for c in np.argwhere(new != FIND_PX_COLOURS)}
    # The reference's expected candidates must all be painted
    for coord in [(1, 5), (2, 2), (4, 4), (5, 6)]:
        assert coord in painted
    # Full candidate set under the reference's selection rules
    assert painted == {(1, 5), (2, 2), (4, 4), (4, 5), (5, 6)}
    # All painted with the (sole) neighbouring colour
    assert all(new[c] == 1 for c in painted)
    # Nothing else changed
    assert np.array_equal(np.where(new != FIND_PX_COLOURS, 1, FIND_PX_COLOURS), new)


def test_flood_sweep_never_paints_border():
    img = np.zeros((6, 6), dtype=np.int32)
    lab = np.zeros((6, 6), dtype=np.int32)
    lab[0, 0] = 1  # seed on the corner
    out = np.asarray(flood_sweep(jnp.asarray(img), jnp.asarray(lab), 254))
    # Only interior pixels can be painted; the corner seed's only 4-neighbours
    # are border pixels, which are never window centres.
    assert np.array_equal(out, lab)
    lab2 = np.zeros((6, 6), dtype=np.int32)
    lab2[0, 2] = 1  # border seed with an interior 4-neighbour
    out2 = np.asarray(flood_sweep(jnp.asarray(img), jnp.asarray(lab2), 254))
    assert out2[1, 2] == 1  # interior neighbour flooded from the border seed


def test_flood_tie_break_min_label():
    img = np.zeros((3, 5), dtype=np.int32)
    lab = np.array([[0, 0, 0, 0, 0], [0, 3, 0, 2, 0], [0, 0, 0, 0, 0]], dtype=np.int32)
    out = np.asarray(flood_sweep(jnp.asarray(img), jnp.asarray(lab), 0))
    assert out[1, 2] == 2  # min of {3, 2}


def test_flood_fixed_point_plateau_rings():
    # A flat plateau is claimed ring-by-ring: the equidistant middle column
    # goes to the min label (pinned tie-break).
    img = np.zeros((5, 7), dtype=np.int32)
    lab = np.zeros((5, 7), dtype=np.int32)
    lab[2, 1] = 2
    lab[2, 5] = 1
    out, painted = flood_fixed_point(jnp.asarray(img), jnp.asarray(lab), 0)
    out = np.asarray(out)
    assert bool(painted)
    assert out[2, 2] == 2 and out[2, 4] == 1
    assert out[2, 3] == 1  # tie at BFS distance 2 from both -> min label
    assert out[1, 1] == 2 and out[3, 1] == 2


MERGE_LABELS = np.array(
    [
        [0, 0, 0, 0, 0, 0, 0, 0],
        [0, 1, 1, 2, 2, 0, 1, 0],
        [0, 1, 1, 2, 2, 0, 1, 0],
        [0, 3, 3, 3, 3, 3, 3, 0],
        [0, 0, 0, 0, 0, 0, 0, 0],
        [0, 4, 4, 0, 5, 5, 6, 0],
        [0, 4, 4, 0, 0, 5, 6, 0],
        [0, 0, 0, 0, 0, 0, 0, 0],
    ],
    dtype=np.int32,
)


def test_touching_pairs_golden():
    assert UNCOLOURED == 0
    assert touching_pairs(MERGE_LABELS) == {(1, 2), (1, 3), (2, 3), (5, 6)}


def test_merge_touching_golden():
    out = np.asarray(merge_touching(jnp.asarray(MERGE_LABELS), 6))
    # {1,2,3} -> 1; {5,6} -> 5; 4 isolated
    expect = MERGE_LABELS.copy()
    expect[expect == 2] = 1
    expect[expect == 3] = 1
    expect[expect == 6] = 5
    assert np.array_equal(out, expect)


def test_merge_touching_transitive_chain():
    # Chain 1-9-2-8 in a row: one min-adjacency round alone would split it
    # into {1,9} and {2,8}; the fixed-point loop must fully unify to 1.
    lab = np.zeros((3, 7), dtype=np.int32)
    lab[1, 1:5] = [1, 9, 2, 8]
    out = np.asarray(merge_touching(jnp.asarray(lab), 9))
    assert set(np.unique(out)) == {0, 1}
    assert np.array_equal(out != 0, lab != 0)


def test_merge_touching_ignores_uncoloured_and_border():
    lab = np.zeros((4, 4), dtype=np.int32)
    lab[0, 0], lab[0, 1] = 1, 2  # two *border* pixels touching: never merged
    out = np.asarray(merge_touching(jnp.asarray(lab), 2))
    assert np.array_equal(out, lab)


def test_resolve_merges_reference_cases(rng):
    # Port of test_make_colour_map (src/lib.rs:544-587), incl. shuffle
    # order-invariance over 10 repetitions.
    ident = np.arange(10)
    for _ in range(10):
        cmap = resolve_merges(ident, np.array([[1, 2]]))
        assert np.array_equal(cmap, [0, 1, 1, 3, 4, 5, 6, 7, 8, 9])

        pairs = np.array([[1, 2], [8, 9]])
        rng.shuffle(pairs, axis=0)
        cmap = resolve_merges(ident, pairs)
        assert np.array_equal(cmap, [0, 1, 1, 3, 4, 5, 6, 7, 8, 8])

        pairs = np.array([[1, 2], [2, 3]])
        rng.shuffle(pairs, axis=0)
        cmap = resolve_merges(ident, pairs)
        assert np.array_equal(cmap, [0, 1, 1, 1, 4, 5, 6, 7, 8, 9])

        # Two consecutive merger rounds applied to the evolving map
        pairs = np.array([[1, 2], [8, 9]])
        rng.shuffle(pairs, axis=0)
        cmap = resolve_merges(ident, pairs)
        pairs = np.array([[1, 7], [7, 8]])
        rng.shuffle(pairs, axis=0)
        cmap = resolve_merges(cmap, pairs)
        assert np.array_equal(cmap, [0, 1, 1, 3, 4, 5, 6, 1, 1, 1])

        # Duplicate mergers
        pairs = np.array([[1, 2], [3, 2], [2, 1]])
        rng.shuffle(pairs, axis=0)
        cmap = resolve_merges(ident, pairs)
        assert np.array_equal(cmap, [0, 1, 1, 1, 4, 5, 6, 7, 8, 9])


def test_recolour_golden():
    assert UNCOLOURED == 0
    cmap = np.array([0, 1, 1, 1, 4, 5, 5])
    answer = MERGE_LABELS.copy()
    answer[answer == 2] = 1
    answer[answer == 3] = 1
    answer[answer == 6] = 5
    out = np.asarray(recolour(jnp.asarray(MERGE_LABELS), cmap))
    assert np.array_equal(out, answer)
    # Changing LUT entries for labels absent from the image does nothing
    cmap2 = np.array([0, 1, 13498683, 13458, 4, 5, 134707134])
    out2 = np.asarray(recolour(jnp.asarray(out), cmap2))
    assert np.array_equal(out2, answer)


def test_local_extrema_reference_quirk():
    # Q1: the code keeps pixels whose 8 neighbours are all strictly LESS
    # (strict local maxima), despite the name find_local_minima.
    img = np.zeros((5, 5), dtype=np.int32)
    img[2, 2] = 9
    mask = np.asarray(local_extrema_mask(jnp.asarray(img)))
    assert mask[2, 2] and mask.sum() == 1
    # A true local minimum is NOT found in reference mode...
    img2 = np.full((5, 5), 9, dtype=np.int32)
    img2[2, 2] = 1
    assert not np.asarray(local_extrema_mask(jnp.asarray(img2))).any()
    # ...but is in 'minima' mode (documented intent).
    assert np.asarray(local_extrema_mask(jnp.asarray(img2), mode="minima"))[2, 2]
    # Plateaus never seed (equal neighbour disqualifies)
    img3 = np.zeros((5, 5), dtype=np.int32)
    img3[2, 2] = 9
    img3[2, 3] = 9
    assert not np.asarray(local_extrema_mask(jnp.asarray(img3))).any()
    # Border pixels are never candidates
    img4 = np.zeros((5, 5), dtype=np.int32)
    img4[0, 2] = 9
    assert not np.asarray(local_extrema_mask(jnp.asarray(img4))).any()


def test_seed_labels_row_major():
    mask = np.zeros((4, 4), dtype=bool)
    mask[1, 2] = mask[2, 1] = mask[3, 3] = True
    lab = np.asarray(seed_labels_from_mask(jnp.asarray(mask)))
    assert lab[1, 2] == 1 and lab[2, 1] == 2 and lab[3, 3] == 3
    assert lab.sum() == 6


def test_paint_seeds_matches_mask_labels():
    mask = np.zeros((6, 6), dtype=bool)
    mask[1, 1] = mask[2, 4] = mask[4, 2] = True
    seeds = [tuple(c) for c in np.argwhere(mask)]
    a = np.asarray(paint_seeds((6, 6), seeds))
    b = np.asarray(seed_labels_from_mask(jnp.asarray(mask)))
    assert np.array_equal(a, b)


def test_paint_seeds_duplicate_coordinates_last_wins():
    # The reference's sequential paint loop overwrites at duplicates
    # (src/lib.rs:1358-1369); the vectorised keep-last dedup must agree.
    seeds = [(1, 1), (2, 2), (1, 1), (3, 3), (2, 2)]
    lab = np.asarray(paint_seeds((5, 5), seeds))
    assert lab[1, 1] == 3  # third seed overwrote the first
    assert lab[2, 2] == 5  # fifth overwrote the second
    assert lab[3, 3] == 4
    assert (lab > 0).sum() == 3
    # Empty seed list
    assert np.asarray(paint_seeds((4, 4), [])).sum() == 0


def test_pre_processor_special_values():
    # Q4 — code behaviour, not docs: +inf -> 0 (ALWAYS_FILL); NaN, -inf,
    # exact zero and subnormals -> 255 (NEVER_FILL).
    img = np.array(
        [[np.nan, np.inf, -np.inf], [0.0, 5e-324, 1.0], [2.0, -1.0, 4.0]],
        dtype=np.float64,
    )
    out = pre_process(img)
    assert out[0, 0] == 255 and out[0, 1] == 0 and out[0, 2] == 255
    assert out[1, 0] == 255 and out[1, 1] == 255
    # min/max folds seeded with zero: finite range is [-1, 4] -> span 5
    assert out[1, 2] == int((1.0 + 1.0) / 5.0 * 254)  # trunc
    assert out[2, 2] == 254
    # Integer zero also maps to NEVER_FILL (is_normal excludes zero)
    iimg = np.array([[0, 1], [2, 4]], dtype=np.int64)
    iout = pre_process(iimg)
    assert iout[0, 0] == 255
    assert iout[1, 1] == 254


def test_pre_processor_validates_max():
    with pytest.raises(ValueError):
        pre_process(np.ones((2, 2)), max_val=255)
    with pytest.raises(ValueError):
        pre_process(np.ones((2, 2)), max_val=0)


def test_lake_sizes_and_value_histogram():
    lab = jnp.asarray(MERGE_LABELS)
    sizes = np.asarray(lake_sizes(lab, 6))
    assert sizes[0] == np.sum(MERGE_LABELS == 0)
    for k in range(1, 7):
        assert sizes[k] == np.sum(MERGE_LABELS == k)
    vh = np.asarray(value_histogram(jnp.asarray(FIND_PX_IMG)))
    assert vh[0] == np.sum(FIND_PX_IMG == 0)
    assert vh[5] == np.sum(FIND_PX_IMG == 5)
    assert vh.sum() == FIND_PX_IMG.size


def test_count_fixed_point_iterations(rng):
    from rustronomy_watershed_tpu.ops.diagnostics import count_fixed_point_iterations

    img = rng.integers(0, 10, size=(16, 16)).astype(np.uint8)
    total, mx, counts = count_fixed_point_iterations(img, max_water_level=9)
    counts = np.asarray(counts)
    assert counts.shape == (10,)
    assert int(total) == counts.sum() and int(mx) == counts.max()
    # every level runs at least the no-change detection sweep
    assert (counts[np.bincount(img.reshape(-1), minlength=10)[:10] > 0] >= 1).all()
