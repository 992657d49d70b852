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


# -- batched per-image broadcast shortcut (ops.level_driver `batch`) --------


def _stacked_merging_case(rng, b=3, h=20, w=24, border_seed=False, nan_blob=False):
    """Build the exact stacked plane transform_batch's merging path builds,
    plus the per-image seed lists / mins it derives on the host."""
    from rustronomy_watershed_tpu.ops.seeds import paint_seeds

    imgs = rng.integers(0, 254, size=(b, h, w)).astype(np.uint8)
    if nan_blob:
        imgs[1, 5:9, 6:10] = NEVER_FILL  # interior barrier in image 1
    seeds_list = [
        [(3, 4), (h - 4, w - 5), (7, 9)],
        [(2, 2), (6, 11)],
        # image 2: seed 1's coordinate is overwritten by seed 3 (keep-last
        # dedup), so the surviving minimum label is 2, NOT 1 — exercises the
        # host-side min computation the broadcast depends on.
        [(4, w - 4), (9, 9), (4, w - 4), (h - 3, 3)],
    ][:b]
    if border_seed:
        seeds_list[1] = seeds_list[1] + [(0, 5)]
    labels0 = jnp.stack([paint_seeds((h, w), s) for s in seeds_list])
    imgs[:, 0, :] = NEVER_FILL
    imgs[:, -1, :] = NEVER_FILL
    imgs[:, :, 0] = NEVER_FILL
    imgs[:, :, -1] = NEVER_FILL
    hs = h + 1
    sep = np.full((b, hs, w), NEVER_FILL, dtype=np.uint8)
    sep[:, :h] = imgs
    labels0 = jnp.pad(labels0, ((0, 0), (0, 1), (0, 0)))
    stacked_img = jnp.asarray(sep.reshape(b * hs, w))
    stacked_lab = labels0.reshape(b * hs, w)
    mins = []
    for s in seeds_list:
        coords = np.asarray(list(s), dtype=np.int64).reshape(-1, 2)
        flat = coords[:, 0] * w + coords[:, 1]
        rev_first = np.unique(flat[::-1], return_index=True)[1]
        keep = flat.shape[0] - 1 - rev_first
        mins.append(int(np.arange(1, flat.shape[0] + 1)[keep].min()))
    return stacked_img, stacked_lab, seeds_list, mins, (b, hs, h, w)


def test_batched_count_matches_structural(rng):
    """On a clean stacked batch the kernel's unclaimed-interior COUNT equals
    exactly the stacking structure's (3b-2)*(w-2) NEVER_FILL cells."""
    stacked_img, stacked_lab, _, _, (b, hs, h, w) = _stacked_merging_case(rng)
    out = relax_packed_planes(
        stacked_img, stacked_lab, interpret=True, fwd_scan=True, steps=64
    )
    _, _, _, _, _, _, y0_valid, mstats, _ = out
    n_uncl, any_border, _ = mstats
    assert bool(y0_valid) and not bool(any_border)
    assert int(n_uncl) == (3 * b - 2) * (w - 2)


@pytest.mark.parametrize("case", ["clean", "border_seed", "nan_blob"])
def test_batched_broadcast_matches_scan_tail(rng, case):
    """run_levels with `batch` must be bit-identical to the general scan
    tail — the broadcast fires on the clean case and must FALL BACK (via the
    count mismatch) on the NaN-blob case.  The border-seed case never passes
    `batch` (transform_batch's host check) but parity is pinned anyway."""
    stacked_img, stacked_lab, _, mins, (b, hs, h, w) = _stacked_merging_case(
        rng, border_seed=(case == "border_seed"), nan_blob=(case == "nan_blob")
    )
    kw = dict(
        n_labels=16, max_water_level=254, merging=True,
        backend="relax_pallas", interpret=True,
    )
    want = run_levels_impl(stacked_img, stacked_lab, **kw)
    if case != "border_seed":
        got = run_levels_impl(
            stacked_img, stacked_lab,
            batch=(b, hs, h), batch_mins=jnp.asarray(mins, jnp.int32), **kw
        )
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    # and the stacked plane agrees with per-image single transforms
    want3 = np.asarray(want).reshape(b, hs, w)[:, :h]
    for i in range(b):
        img_i = np.asarray(stacked_img).reshape(b, hs, w)[i, :h]
        lab_i = np.asarray(stacked_lab).reshape(b, hs, w)[i, :h]
        single = run_levels_impl(
            jnp.asarray(img_i), jnp.asarray(lab_i), **kw
        )
        np.testing.assert_array_equal(want3[i], np.asarray(single))


def test_transform_batch_merging_uses_shortcut_path(rng):
    """Public API: batched merging with the relax_pallas backend (interpret
    mode) is bit-identical to per-image transforms on a clean batch."""
    from rustronomy_watershed_tpu import TransformBuilder

    b, h, w = 3, 18, 22
    imgs = rng.integers(0, 254, size=(b, h, w)).astype(np.uint8)
    ws = (
        TransformBuilder.default()
        .set_max_water_lvl(254)
        .set_backend("relax_pallas")
        .build_merging()
    )
    ws._interpret = True
    seeds_list = [ws.find_local_minima(im) for im in imgs]
    batched = ws.transform_batch(imgs, seeds_list)
    for i in range(b):
        single = ws.transform(imgs[i], seeds_list[i])
        np.testing.assert_array_equal(batched[i], single, err_msg=f"img{i}")


def test_stats_only_epilogue_matches_full_fused(rng):
    """fwd_scan='stats' (the production merging epilogue, VERDICT r3 #1)
    must return bit-identical planes and mstats to fwd_scan=True, with
    y0=None — on the 1-D band kernel AND the striped (2-D) kernel — and
    the stats-only component_min tail (y0=None) must equal the fused one."""
    from rustronomy_watershed_tpu.ops.scan_merge import (
        component_min_from_padded,
    )

    img = rng.integers(0, 254, (64, 96)).astype(np.uint8)
    # NaN-lace a corner so the general tail is the live branch.
    img[20:28, 30:50] = 255
    lab0 = np.asarray(
        seed_labels_from_mask(local_extrema_mask(jnp.asarray(img, jnp.int32)))
    )
    for stripes in (None, (2, 128)):
        kw = dict(interpret=True, steps=16, stripes=stripes)
        full = relax_packed_planes(img, lab0, fwd_scan=True, **kw)
        stat = relax_packed_planes(img, lab0, fwd_scan="stats", **kw)
        kf, lf, pf, cf, tf, y0f, vf, msf, _ = full
        ks, ls, ps, cs, ts, y0s, vs, mss, _ = stat
        assert y0s is None and y0f is not None
        np.testing.assert_array_equal(np.asarray(kf), np.asarray(ks))
        np.testing.assert_array_equal(np.asarray(lf), np.asarray(ls))
        assert (pf, cf, tf) == (ps, cs, ts)
        assert bool(vf) == bool(vs)
        for a, b in zip(msf, mss):
            assert int(a) == int(b), (msf, mss)
        h, w = img.shape
        tail_full = component_min_from_padded(
            lf, p=pf, h=h, w=w, tile=tf, interpret=True, y0=y0f,
            y0_valid=vf, col_off=cf,
        )
        tail_stat = component_min_from_padded(
            ls, p=ps, h=h, w=w, tile=ts, interpret=True, col_off=cs,
        )
        np.testing.assert_array_equal(
            np.asarray(tail_full), np.asarray(tail_stat)
        )
