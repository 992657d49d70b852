"""Fast merging engine: scan-based component-min + edge-union level curves.

Pins bit-parity of the relax-based merging paths (ops.scan_merge,
ops.merge_curve) against the round-1-verified level-sweep merging driver
(itself oracle-pinned vs /root/reference/src/lib.rs:1446-1470 semantics in
test_transform/test_native_oracle).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from rustronomy_watershed_tpu.ops.level_driver import run_levels
from rustronomy_watershed_tpu.ops.merge import merge_touching
from rustronomy_watershed_tpu.ops.merge_curve import (
    merge_edges,
    merged_sizes_host,
    relax_merging_sizes,
)
from rustronomy_watershed_tpu.ops.scan_merge import component_min_labels
from rustronomy_watershed_tpu.ops.seeds import (
    local_extrema_mask,
    paint_seeds,
    seed_labels_from_mask,
)


def _field(rng, shape, hi):
    img = rng.integers(0, hi, size=shape).astype(np.uint8)
    lab0 = seed_labels_from_mask(local_extrema_mask(jnp.asarray(img)))
    k = int(jnp.max(lab0))
    if k == 0:
        lab0 = paint_seeds(shape, [(2, 2), (shape[0] - 3, shape[1] - 3)])
        k = 2
    return img, lab0, k


@pytest.mark.parametrize("shape,hi,maxlvl", [((40, 52), 20, 18), ((32, 32), 254, 254), ((50, 44), 4, 2)])
@pytest.mark.parametrize("use_pallas", [False, True])
def test_component_min_matches_level_sweep_merging(rng, shape, hi, maxlvl, use_pallas):
    img, lab0, k = _field(rng, shape, hi)
    want = np.asarray(
        run_levels(jnp.asarray(img), lab0, n_labels=k, max_water_level=maxlvl,
                   merging=True, backend="jnp")
    )
    seg = run_levels(jnp.asarray(img), lab0, n_labels=k, max_water_level=maxlvl,
                     merging=False, backend="relax")
    got = np.asarray(
        component_min_labels(jnp.asarray(seg), use_pallas=use_pallas,
                             interpret=use_pallas)
    )
    np.testing.assert_array_equal(got, want)


def test_fused_round_kernels_match_jnp(rng):
    # The fused-round kernels (banded fwd-v then bwd-v+h, with cross-band
    # carries) must match the jnp associative-scan path bit-exactly —
    # forcing a small band height exercises the inter-band carry rows.
    for h, w, tile in ((16, 128, 8), (64, 200, 16), (40, 384, 8)):
        lab = jnp.asarray(
            np.where(rng.random((h, w)) < 0.3, 0,
                     rng.integers(1, 50, (h, w))).astype(np.int32)
        )
        want = np.asarray(component_min_labels(lab, use_pallas=False))
        got = np.asarray(
            component_min_labels(lab, use_pallas=True, interpret=True, tile=tile)
        )
        np.testing.assert_array_equal(got, want)


def test_component_min_blocked_border_edges():
    # Two seeds adjacent along the top border: the reference's interior-
    # centred windows never detect the pair, so they must NOT merge.
    lab = np.zeros((6, 8), np.int32)
    lab[0, 3], lab[0, 4] = 5, 9
    out = np.asarray(component_min_labels(jnp.asarray(lab), use_pallas=False))
    assert out[0, 3] == 5 and out[0, 4] == 9
    # ... but a border pixel connected through an interior pixel does merge.
    lab2 = np.zeros((6, 8), np.int32)
    lab2[0, 3], lab2[1, 3], lab2[1, 4], lab2[0, 4] = 5, 5, 9, 9
    out2 = np.asarray(component_min_labels(jnp.asarray(lab2), use_pallas=False))
    assert (out2[lab2 > 0] == 5).all()


@pytest.mark.parametrize("shape,hi,maxlvl", [((40, 52), 20, 18), ((48, 36), 254, 254), ((56, 56), 4, 3)])
@pytest.mark.parametrize("backend", ["relax", "relax_pallas"])
def test_relax_merging_sizes_matches_level_sweep(rng, shape, hi, maxlvl, backend):
    img, lab0, k = _field(rng, shape, hi)
    want_lab, want_sz = run_levels(
        jnp.asarray(img), lab0, n_labels=k, max_water_level=maxlvl,
        merging=True, backend="jnp", collect="sizes",
    )
    got_lab, got_sz, _ = relax_merging_sizes(
        jnp.asarray(img), lab0, n_labels=k, max_water_level=maxlvl,
        backend=backend, interpret=(backend == "relax_pallas"),
    )
    np.testing.assert_array_equal(np.asarray(got_lab), np.asarray(want_lab))
    np.testing.assert_array_equal(np.asarray(got_sz), np.asarray(want_sz))


@pytest.mark.parametrize(
    "shape,hi,maxlvl",
    [((40, 52), 20, 18), ((48, 36), 254, 254), ((56, 56), 4, 3)],
)
@pytest.mark.parametrize("backend", ["relax", "relax_pallas"])
def test_relax_segmenting_sizes_matches_level_sweep(rng, shape, hi, maxlvl, backend):
    """merging=False: the segmenting curves from ONE relax pass (cumulative
    claim counts, zero edges) must match the per-level sweep driver
    column-for-column — this is the compact-planes path the public
    segmenting transform_to_list now takes."""
    img, lab0, k = _field(rng, shape, hi)
    want_lab, want_sz = run_levels(
        jnp.asarray(img), lab0, n_labels=k, max_water_level=maxlvl,
        merging=False, backend="jnp", collect="sizes",
    )
    got_lab, got_sz, _ = relax_merging_sizes(
        jnp.asarray(img), lab0, n_labels=k, max_water_level=maxlvl,
        backend=backend, interpret=(backend == "relax_pallas"),
        merging=False,
    )
    np.testing.assert_array_equal(np.asarray(got_lab), np.asarray(want_lab))
    np.testing.assert_array_equal(np.asarray(got_sz), np.asarray(want_sz))


def test_relax_segmenting_sizes_never_fill(rng):
    """NEVER_FILL (255) pixels stay uncoloured at every level: the compact
    path's uncoloured column must track the sweep driver's exactly."""
    img = rng.integers(0, 200, size=(44, 40)).astype(np.uint8)
    img[::7, ::5] = 255
    lab0 = seed_labels_from_mask(local_extrema_mask(jnp.asarray(img)))
    k = int(jnp.max(lab0))
    _, want = run_levels(
        jnp.asarray(img), lab0, n_labels=k, max_water_level=254,
        merging=False, backend="jnp", collect="sizes",
    )
    _, got, _ = relax_merging_sizes(
        jnp.asarray(img), lab0, n_labels=k, max_water_level=254,
        backend="relax", merging=False,
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_segmenting_transform_to_list_public_api(rng):
    # Public surface: segmenting transform_to_list identical between the
    # compact-planes fast path (auto backend) and the level-sweep driver.
    from rustronomy_watershed_tpu.prelude import TransformBuilder

    img = rng.integers(0, 30, size=(28, 36)).astype(np.uint8)
    fast = TransformBuilder.default().set_max_water_lvl(29).build_segmenting()
    slow = (
        TransformBuilder.default()
        .set_max_water_lvl(29)
        .set_backend("jnp")
        .build_segmenting()
    )
    seeds = fast.find_local_minima(img)
    a = fast.transform_to_list(img, seeds, counts_length=len(seeds) + 1)
    b = slow.transform_to_list(img, seeds, counts_length=len(seeds) + 1)
    assert len(a) == len(b) == 30
    for (la, ca), (lb, cb) in zip(a, b):
        assert la == lb
        np.testing.assert_array_equal(ca, cb)


@pytest.mark.parametrize("merging", [False, True])
@pytest.mark.parametrize("backend", ["relax", "relax_pallas"])
def test_relax_history_matches_level_sweep(rng, merging, backend):
    """Per-level snapshots rebuilt from the compact planes (segmenting:
    claim-level mask; merging: incremental union LUT gather) must equal the
    sweep driver's device-stacked history plane-for-plane."""
    from rustronomy_watershed_tpu.ops.merge_curve import relax_history

    img, lab0, k = _field(rng, (40, 52), 20)
    _, want = run_levels(
        jnp.asarray(img), lab0, n_labels=k, max_water_level=18,
        merging=merging, backend="jnp", collect="history",
    )
    want = np.asarray(want)
    snaps, starved = relax_history(
        jnp.asarray(img), lab0, n_labels=k, max_water_level=18,
        backend=backend, interpret=(backend == "relax_pallas"),
        merging=merging,
    )
    assert not starved and len(snaps) == 19
    for lvl, snap in snaps:
        assert snap.dtype == np.int32
        np.testing.assert_array_equal(snap, want[lvl], err_msg=f"lvl={lvl}")


def test_relax_history_never_fill_full_depth(rng):
    from rustronomy_watershed_tpu.ops.merge_curve import relax_history

    img = rng.integers(0, 200, size=(36, 44)).astype(np.uint8)
    img[::6, ::7] = 255
    lab0 = seed_labels_from_mask(local_extrema_mask(jnp.asarray(img)))
    k = int(jnp.max(lab0))
    _, want = run_levels(
        jnp.asarray(img), lab0, n_labels=k, max_water_level=254,
        merging=True, backend="jnp", collect="history",
    )
    want = np.asarray(want)
    snaps, _ = relax_history(
        jnp.asarray(img), lab0, n_labels=k, max_water_level=254,
        backend="relax", merging=True,
    )
    for lvl, snap in snaps:
        np.testing.assert_array_equal(snap, want[lvl], err_msg=f"lvl={lvl}")


def test_transform_history_public_api_both_variants(rng):
    # Public surface: transform_history identical between the compact-planes
    # fast path (auto backend) and the level-sweep driver, both variants.
    from rustronomy_watershed_tpu.prelude import TransformBuilder

    img = rng.integers(0, 14, size=(26, 30)).astype(np.uint8)
    for build in ("build_segmenting", "build_merging"):
        fast = getattr(
            TransformBuilder.default().set_max_water_lvl(13), build
        )()
        slow = getattr(
            TransformBuilder.default().set_max_water_lvl(13).set_backend("jnp"),
            build,
        )()
        seeds = fast.find_local_minima(img)
        a = fast.transform_history(img, seeds)
        b = slow.transform_history(img, seeds)
        assert len(a) == len(b) == 14
        for (la, ca), (lb, cb) in zip(a, b):
            assert la == lb
            np.testing.assert_array_equal(ca, cb, err_msg=build)


def test_relax_merging_sizes_packed_wire_tier(rng):
    """Label buckets in [2^16, 2^24) ship ONE packed uint32 plane (label |
    lv8<<24, merge_curve._device_curves) — n_labels is static, so forcing a
    big bucket on a small image exercises exactly the tier real >=65k-seed
    images take.  Sizes must match the small-bucket run column-for-column,
    and out_width must ride through."""
    img, lab0, k = _field(rng, (40, 52), 20)
    _, small, _ = relax_merging_sizes(
        jnp.asarray(img), lab0, n_labels=k, max_water_level=18,
        backend="relax",
    )
    _, packed, _ = relax_merging_sizes(
        jnp.asarray(img), lab0, n_labels=70_000, max_water_level=18,
        backend="relax",
    )
    assert packed.shape == (19, 70_001)
    np.testing.assert_array_equal(packed[:, : k + 1], small)
    assert (packed[:, k + 1 :] == 0).all()
    _, narrow, _ = relax_merging_sizes(
        jnp.asarray(img), lab0, n_labels=70_000, max_water_level=18,
        backend="relax", out_width=k + 1,
    )
    np.testing.assert_array_equal(narrow, small)


def test_unpack_wire_roundtrip():
    from rustronomy_watershed_tpu.ops.merge_curve import unpack_wire

    r = np.random.default_rng(7)
    lab = r.integers(0, 2**24, size=257).astype(np.int32)
    lv = r.integers(0, 256, size=257).astype(np.uint8)
    wire = lab.astype(np.uint32) | (lv.astype(np.uint32) << 24)
    got_lab, got_lv = unpack_wire(wire)
    np.testing.assert_array_equal(got_lab, lab)
    np.testing.assert_array_equal(got_lv, lv)
    # Non-packed tiers pass through.
    got_lab, got_lv = unpack_wire(lab.astype(np.uint16), lv)
    assert got_lab.dtype == np.uint16 and got_lv is not None


def test_merge_edges_dedup_and_activation(rng):
    # Hand-checkable: two regions meeting along a line, claimed at known
    # levels -> one unique edge with the minimal activation level.
    s = jnp.asarray(np.array([
        [0, 0, 0, 0, 0],
        [0, 1, 1, 2, 0],
        [0, 1, 1, 2, 0],
        [0, 0, 0, 0, 0],
    ], np.int32))
    L = jnp.asarray(np.array([
        [9, 9, 9, 9, 9],
        [9, 0, 1, 3, 9],
        [9, 1, 2, 4, 9],
        [9, 9, 9, 9, 9],
    ], np.int32))
    lo, hi, act, n = merge_edges(s, L, max_water_level=8)
    n = int(n)
    assert n == 1
    assert (int(lo[0]), int(hi[0])) == (1, 2)
    # pairs (1@L1,2@L3) act 3 and (1@L2,2@L4) act 4 -> min 3
    assert int(act[0]) == 3


def test_merging_transform_to_list_public_api(rng):
    # Public surface: merging transform_to_list identical between the fast
    # relax path (backend auto on CPU -> relax) and the level-sweep backend.
    from rustronomy_watershed_tpu.prelude import TransformBuilder

    img = rng.integers(0, 30, size=(48, 48)).astype(np.uint8)
    ws_fast = TransformBuilder.default().set_max_water_lvl(29).build_merging()
    ws_slow = TransformBuilder.default().set_max_water_lvl(29).build_merging()
    ws_slow.backend = "jnp"
    seeds = ws_fast.find_local_minima(img)
    a = ws_fast.transform_to_list(img, seeds, counts_length=len(seeds) + 1)
    b = ws_slow.transform_to_list(img, seeds, counts_length=len(seeds) + 1)
    assert len(a) == len(b) == 30
    for (la, ca), (lb, cb) in zip(a, b):
        assert la == lb
        np.testing.assert_array_equal(ca, cb)


def test_component_min_from_padded_matches_plain(rng):
    """The fused padded-plane merging tail (relax_packed_planes ->
    component_min_from_padded, no extraction pass) must bit-match both the
    plain scan path and the level-sweep merging driver at full depth."""
    import jax.numpy as jnp

    from rustronomy_watershed_tpu.ops import paint_seeds, run_levels

    img = rng.integers(0, 254, size=(40, 56)).astype(np.uint8)
    seeds = [(3, 3), (30, 50), (17, 22), (38, 5), (1, 54), (20, 33)]
    lab0 = paint_seeds(img.shape, seeds)
    want = np.asarray(
        run_levels(jnp.asarray(img), lab0, n_labels=6, max_water_level=254,
                   merging=True, backend="jnp")
    )
    got = np.asarray(
        run_levels(jnp.asarray(img), lab0, n_labels=6, max_water_level=254,
                   merging=True, backend="relax_pallas", tile=16, steps=8,
                   interpret=True)
    )
    np.testing.assert_array_equal(got, want)


def test_component_min_spiral_needs_multiple_rounds(rng):
    """A serpentine component with high staircase complexity: the scan loop
    must NOT exit before the true component-min fixed point (exercises the
    violation-stencil witness across several rounds and band boundaries)."""
    import jax.numpy as jnp

    from rustronomy_watershed_tpu.ops.merge import merge_touching
    from rustronomy_watershed_tpu.ops.scan_merge import component_min_labels

    h = w = 48
    lab = np.zeros((h, w), np.int32)
    # serpentine corridor: rows 2,4,6,... filled, connected alternately at
    # the left/right ends; distinct labels along the way, min deep inside.
    nxt = 1000
    for r in range(2, h - 2, 2):
        lab[r, 2:-2] = nxt
        nxt += 7
        if r + 2 < h - 2:
            col = 2 if (r // 2) % 2 == 0 else w - 3
            lab[r + 1, col] = nxt
            nxt += 3
    lab[h - 4, w // 2] = 5  # the minimum, far (in scan rounds) from the ends
    want = np.asarray(merge_touching(jnp.asarray(lab), int(lab.max())))
    for use_pallas in (False, True):
        got = np.asarray(
            component_min_labels(
                jnp.asarray(lab), use_pallas=use_pallas, interpret=use_pallas,
                tile=8,
            )
        )
        np.testing.assert_array_equal(got, want, err_msg=f"pallas={use_pallas}")


def test_fused_fwd_scan_epilogue_matches_standalone_pass(rng):
    """The relax kernel's fused fwd-vertical scan epilogue (merging pass 1
    riding the converging relax call) must bit-match the standalone
    _fwd_v_kernel pass on the same fixed-point plane — in BOTH branches:
    y0_valid=True (one-call convergence, epilogue output used) and
    y0_valid=False (multi-call, caller falls back to the standalone pass)."""
    from rustronomy_watershed_tpu.ops.pallas_relax import (
        pack_domain,
        relax_fixed_point_fused,
    )
    from rustronomy_watershed_tpu.ops.scan_merge import (
        _call_round_kernel,
        _fwd_v_kernel,
    )
    from rustronomy_watershed_tpu.ops.seeds import (
        local_extrema_mask,
        seed_labels_from_mask,
    )

    img = rng.integers(0, 254, size=(40, 56)).astype(np.uint8)
    lab0 = seed_labels_from_mask(local_extrema_mask(jnp.asarray(img, jnp.int32)))
    seen_valid = []
    # steps=40 > any chain length here -> one-call convergence (valid path);
    # steps=8 -> multi-call (fallback path).
    for steps, tile in ((40, 40), (8, 16)):
        v_pad, key_pad, lab_pad = pack_domain(img, lab0, tile, steps)
        _, lab, y0, y0_valid, _mstats, _ = relax_fixed_point_fused(
            v_pad, key_pad, lab_pad, col_lo=steps, col_hi=steps + 56 - 1,
            real_h=40, tile=tile, steps=steps, interpret=True,
        )
        h2 = lab.shape[0] - 2 * steps
        want = np.asarray(
            _call_round_kernel(
                _fwd_v_kernel, lab, tile=tile, interpret=True, out_rows=h2,
                col_lo=steps, col_hi=steps + 56 - 1, row_off=steps,
                always_write=True,
            )[0]
        )
        seen_valid.append(bool(y0_valid))
        if bool(y0_valid):
            np.testing.assert_array_equal(np.asarray(y0), want)
    assert seen_valid[0], "steps=40 should converge+certify in one call"
    assert not seen_valid[1], "steps=8 should need further calls at 40x56"


def test_native_merged_curve_matches_numpy(rng):
    """The C++ one-pass to_list tail (parity/oracle.cc merged_curve_oracle)
    must be bit-identical to the NumPy host_cumulative_counts +
    merged_sizes_host pair on randomized planes/edge sets, including
    never-claimed pixels, labels masked above max level, and multi-edge
    transitive unions."""
    native = pytest.importorskip("rustronomy_watershed_tpu.parity.native")
    from rustronomy_watershed_tpu.ops.merge_curve import host_cumulative_counts

    for trial in range(5):
        r = np.random.default_rng(500 + trial)
        npx, k = 4000, 37
        maxlvl = int(r.choice([5, 40, 254]))
        levels = maxlvl + 1
        labels = r.integers(0, k + 1, size=npx).astype(np.int32)
        lv8 = r.integers(0, levels + 1, size=npx).astype(np.uint8)
        # claimed-ness invariant: label 0 <=> never-claimed bucket
        lv8[labels == 0] = levels
        labels[lv8 == levels] = 0
        ne = int(r.integers(0, 60))
        lo = r.integers(1, k, size=ne).astype(np.int32)
        hi = (lo + r.integers(1, k - 1, size=ne)).astype(np.int32) % k + 1
        keep = lo != hi
        lo2 = np.minimum(lo, hi)[keep]
        hi2 = np.maximum(lo, hi)[keep]
        act = r.integers(0, maxlvl + 1, size=lo2.size).astype(np.int32)
        cum = host_cumulative_counts(labels, lv8, k, maxlvl)
        want = merged_sizes_host(cum, lo2.astype(np.int64), hi2.astype(np.int64), act)
        got = native.native_merged_curve(labels, lv8, k, maxlvl, lo2, hi2, act)
        np.testing.assert_array_equal(got, want, err_msg=f"trial={trial}")

        # out_width contract: rows at result width directly.  Wider =
        # zero-padded (untouched calloc tail); narrower = representatives
        # >= out_width truncated — exactly what _expand_rows applied.
        wide = native.native_merged_curve(
            labels, lv8, k, maxlvl, lo2, hi2, act, out_width=k + 9
        )
        assert wide.shape == (levels, k + 9)
        np.testing.assert_array_equal(wide[:, : k + 1], want)
        assert (wide[:, k + 1 :] == 0).all()
        narrow_w = max(2, k - 7)
        narrow = native.native_merged_curve(
            labels, lv8, k, maxlvl, lo2, hi2, act, out_width=narrow_w
        )
        np.testing.assert_array_equal(
            narrow, want[:, :narrow_w], err_msg=f"trial={trial} narrow"
        )


def test_tail_tile_divisor_choice():
    """The scan tail's band height: largest 8-multiple divisor of the
    padded height <= 64 (short bands pay fewer bwd-scan doubling steps —
    BENCHMARKS r7)."""
    from rustronomy_watershed_tpu.ops.scan_merge import _tail_tile

    assert _tail_tile(4160) == 64   # 13 x 320 (the 4096² geometry)
    assert _tail_tile(1024) == 64
    assert _tail_tile(8208) == 48   # 57 x 144: 64 does not divide
    assert _tail_tile(8) == 8
    assert _tail_tile(40) == 40


def test_alternating_rounds_match_union_find_on_maze(rng):
    """The r11 alternating single-pass round schedule (bwd_vh / fwd_vh) must
    reach the same unique fixed point as an independent host union-find on
    adversarial hole-laced 'maze' fields (30% barriers — the NaN-masked
    astronomy regime that runs ~50+ rounds; VERDICT r3 #2)."""
    from rustronomy_watershed_tpu.ops.scan_merge import component_min_labels

    h, w = 48, 80
    lab = rng.integers(1, 400, size=(h, w)).astype(np.int32)
    lab[rng.random((h, w)) < 0.3] = 0
    got = np.asarray(
        component_min_labels(jnp.asarray(lab), use_pallas=True, interpret=True)
    )

    parent = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    idx = lambda y, x: y * w + x  # noqa: E731
    for y in range(h):
        for x in range(w):
            if lab[y, x] == 0:
                continue
            # blocked border-border pairs: h-edges in rows {0, h-1},
            # v-edges in cols {0, w-1} (reference window-centre rule)
            if x + 1 < w and lab[y, x + 1] != 0 and y not in (0, h - 1):
                union(idx(y, x), idx(y, x + 1))
            if y + 1 < h and lab[y + 1, x] != 0 and x not in (0, w - 1):
                union(idx(y, x), idx(y + 1, x))
    comp_min = {}
    for y in range(h):
        for x in range(w):
            if lab[y, x]:
                r = find(idx(y, x))
                comp_min[r] = min(comp_min.get(r, 1 << 30), int(lab[y, x]))
    want = np.zeros_like(lab)
    for y in range(h):
        for x in range(w):
            if lab[y, x]:
                want[y, x] = comp_min[find(idx(y, x))]
    np.testing.assert_array_equal(got, want)


def test_coarse_tail_matches_fine_on_nan_and_border_seeds(rng):
    """The 2x-row-coarsened general tail (r11,
    scan_merge.component_min_coarse_from_padded) must be bit-identical to
    the fine tail on dense, NaN-laced and border-seed fields — including
    the border-column fold/resolve machinery (border 2x1 blocks are
    internally DISCONNECTED, so border columns live outside the coarse
    system)."""
    from rustronomy_watershed_tpu.ops import paint_seeds
    from rustronomy_watershed_tpu.ops.pallas_relax import relax_packed_planes
    from rustronomy_watershed_tpu.ops.scan_merge import (
        component_min_coarse_from_padded,
        component_min_from_padded,
    )

    cases = []
    img = rng.integers(0, 254, size=(64, 128)).astype(np.uint8)
    cases.append((img, None))
    img = rng.integers(0, 254, size=(96, 128)).astype(np.uint8)
    img[rng.random((96, 128)) < 0.2] = 255
    cases.append((img, None))
    img = rng.integers(0, 40, size=(48, 64)).astype(np.uint8)
    img[rng.random((48, 64)) < 0.1] = 255
    cases.append(
        (img, [(0, 5), (0, 63), (47, 3), (7, 0), (47, 63), (24, 32), (0, 0)])
    )
    for img, seeds in cases:
        h, w = img.shape
        if seeds is None:
            from rustronomy_watershed_tpu.ops.seeds import (
                local_extrema_mask,
                seed_labels_from_mask,
            )

            lab0 = seed_labels_from_mask(
                local_extrema_mask(jnp.asarray(img, jnp.int32))
            )
        else:
            lab0 = paint_seeds((h, w), seeds)
        out = relax_packed_planes(
            jnp.asarray(img, jnp.int32), lab0, fwd_scan="stats",
            interpret=True, steps=16,
        )
        lab_pad, p, col_off, tile = out[1], out[2], out[3], out[4]
        fine = component_min_from_padded(
            lab_pad, p=p, h=h, w=w, tile=tile, interpret=True,
            col_off=col_off,
        )
        coarse = component_min_coarse_from_padded(
            lab_pad, p=p, h=h, w=w, interpret=True, col_off=col_off
        )
        np.testing.assert_array_equal(np.asarray(fine), np.asarray(coarse))

    # Striped relax geometry (col_off = _STRIPE_HALO, lane padding between
    # and beyond stripes): the coarse tail must treat the pad lanes as
    # barriers exactly like the fine tail.
    img = rng.integers(0, 254, size=(96, 192)).astype(np.uint8)
    img[rng.random((96, 192)) < 0.15] = 255
    from rustronomy_watershed_tpu.ops.seeds import (
        local_extrema_mask,
        seed_labels_from_mask,
    )

    lab0 = seed_labels_from_mask(
        local_extrema_mask(jnp.asarray(img, jnp.int32))
    )
    out = relax_packed_planes(
        jnp.asarray(img, jnp.int32), lab0, fwd_scan="stats",
        interpret=True, steps=16, stripes=(2, 128),
    )
    lab_pad, p, col_off, tile = out[1], out[2], out[3], out[4]
    fine = component_min_from_padded(
        lab_pad, p=p, h=96, w=192, tile=tile, interpret=True,
        col_off=col_off,
    )
    coarse = component_min_coarse_from_padded(
        lab_pad, p=p, h=96, w=192, interpret=True, col_off=col_off
    )
    np.testing.assert_array_equal(np.asarray(fine), np.asarray(coarse))


@pytest.mark.parametrize("trial", range(6))
def test_coarse_tail_randomized_differential(rng, trial):
    """Randomized coarse-vs-fine differential (slim CI version of the r11
    60-trial fuzz campaign, 0 failures): random dynamic ranges, sentinel
    densities up to 60%, painted border/corner seeds, mixed steps."""
    from rustronomy_watershed_tpu.ops import paint_seeds
    from rustronomy_watershed_tpu.ops.pallas_relax import relax_packed_planes
    from rustronomy_watershed_tpu.ops.scan_merge import (
        component_min_coarse_from_padded,
        component_min_from_padded,
    )
    from rustronomy_watershed_tpu.ops.seeds import (
        local_extrema_mask,
        seed_labels_from_mask,
    )

    gen = np.random.default_rng(1000 + trial)
    h, w = [(32, 64), (48, 192), (64, 64)][trial % 3]
    hi = int(gen.choice([3, 60, 254]))
    img = gen.integers(0, hi, size=(h, w)).astype(np.uint8)
    img[gen.random((h, w)) < float(gen.choice([0.05, 0.3, 0.6]))] = 255
    if trial % 2:
        coords = list(
            {
                (int(gen.integers(0, h)), int(gen.integers(0, w)))
                for _ in range(8)
            }
        )
        lab0 = paint_seeds((h, w), coords)
    else:
        lab0 = seed_labels_from_mask(
            local_extrema_mask(jnp.asarray(img, jnp.int32))
        )
    if int(np.asarray(lab0).max()) == 0:
        pytest.skip("no seeds in this draw")
    out = relax_packed_planes(
        jnp.asarray(img, jnp.int32), lab0, fwd_scan="stats",
        interpret=True, steps=16,
    )
    lab_pad, p, col_off, tile = out[1], out[2], out[3], out[4]
    if (lab_pad.shape[0] - 2 * p) % 16:
        pytest.skip("fine-tail geometry (production gate)")
    fine = component_min_from_padded(
        lab_pad, p=p, h=h, w=w, tile=tile, interpret=True, col_off=col_off
    )
    coarse = component_min_coarse_from_padded(
        lab_pad, p=p, h=h, w=w, interpret=True, col_off=col_off
    )
    np.testing.assert_array_equal(np.asarray(fine), np.asarray(coarse))


def test_coarse_tail_windowed_h_flag_parity(rng, monkeypatch):
    """RWT_COARSE_HWIN (windowed-h round schedule, BENCHMARKS r11) must not
    change the fixed point — bit-identity is schedule-independent via the
    violation stencil."""
    from rustronomy_watershed_tpu.ops.pallas_relax import relax_packed_planes
    from rustronomy_watershed_tpu.ops.scan_merge import (
        component_min_coarse_from_padded,
    )
    from rustronomy_watershed_tpu.ops.seeds import (
        local_extrema_mask,
        seed_labels_from_mask,
    )

    img = rng.integers(0, 254, size=(64, 256)).astype(np.uint8)
    img[rng.random((64, 256)) < 0.25] = 255
    lab0 = seed_labels_from_mask(
        local_extrema_mask(jnp.asarray(img, jnp.int32))
    )
    out = relax_packed_planes(
        jnp.asarray(img, jnp.int32), lab0, fwd_scan="stats",
        interpret=True, steps=16,
    )
    lab_pad, p, col_off = out[1], out[2], out[3]
    base = np.asarray(
        component_min_coarse_from_padded(
            lab_pad, p=p, h=64, w=256, interpret=True, col_off=col_off
        )
    )
    # The flag is captured ONCE at import (advisor r4: a trace-time env read
    # silently ignored mid-session changes) — patch the module constant.
    import rustronomy_watershed_tpu.ops.scan_merge as _sm

    monkeypatch.setattr(_sm, "_COARSE_HWIN", 128)
    windowed = np.asarray(
        component_min_coarse_from_padded(
            lab_pad, p=p, h=64, w=256, interpret=True, col_off=col_off
        )
    )
    np.testing.assert_array_equal(base, windowed)


def test_component_min_labels_max_label_coarse_route(rng):
    """component_min_labels(max_label=<static bound>) routes the Pallas
    path onto the coarse engine (r11) — bit-identical to both the fine
    Pallas fixed point and the jnp oracle, including on 30%-barrier
    mazes with claimed border rows."""
    lab = rng.integers(1, 300, size=(64, 96)).astype(np.int32)
    lab[rng.random(lab.shape) < 0.3] = 0
    a = np.asarray(
        component_min_labels(jnp.asarray(lab), use_pallas=True, interpret=True)
    )
    b = np.asarray(
        component_min_labels(
            jnp.asarray(lab), use_pallas=True, interpret=True, max_label=512
        )
    )
    c = np.asarray(component_min_labels(jnp.asarray(lab), use_pallas=False))
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(a, c)


def test_component_min_labels_two_columns_routes_fine(rng):
    """w == 2 planes must NOT take the coarse route (advisor r4): both
    columns are border columns, so the coarse system is empty while the
    fine engine still h-merges the two columns per row.  The max_label
    branch gates on w >= 3 and stays bit-identical to the jnp oracle."""
    for w in (2, 3):
        lab = rng.integers(0, 5, size=(32, w)).astype(np.int32)
        lab[0, :] = [1, 2][:w] if w == 2 else [1, 2, 3]
        a = np.asarray(
            component_min_labels(
                jnp.asarray(lab), use_pallas=True, interpret=True,
                max_label=8,
            )
        )
        b = np.asarray(component_min_labels(jnp.asarray(lab), use_pallas=False))
        np.testing.assert_array_equal(a, b)


def test_vmem_recovery_register_dedupes():
    """register_vmem_recovery must be idempotent (advisor r4: module reload
    appended duplicate hooks, doubling the derate per retry) and the OOM
    path must step ALL registered hooks, not short-circuit on the first."""
    from rustronomy_watershed_tpu import _compat

    calls = {"a": 0, "b": 0}

    def hook_a():
        calls["a"] += 1
        return True

    def hook_b():
        calls["b"] += 1
        return True

    saved = list(_compat._vmem_recovery_hooks)
    try:
        _compat._vmem_recovery_hooks.clear()
        _compat.register_vmem_recovery(hook_a)
        _compat.register_vmem_recovery(hook_a)  # reload double-register
        _compat.register_vmem_recovery(hook_b)
        assert _compat._vmem_recovery_hooks == [hook_a, hook_b]

        boom = {"n": 0}

        @_compat.cache_resilient
        def entry():
            boom["n"] += 1
            if boom["n"] == 1:
                raise RuntimeError("Ran out of memory in memory space vmem")
            return 42

        assert entry() == 42
        assert calls == {"a": 1, "b": 1}  # both hooks stepped, once each
    finally:
        _compat._vmem_recovery_hooks[:] = saved


def test_coarse_multi_engine_knob_parity(rng, monkeypatch):
    """The r12 multi-iteration engine must be bit-identical to the legacy
    two-pass rounds (RWT_COARSE_MULTI=0) and invariant to the sub-iteration
    count k — the violation stencil makes the fixed point schedule-
    independent.  Geometry includes a single-band plane (hc <= tile)."""
    import rustronomy_watershed_tpu.ops.scan_merge as _sm
    from rustronomy_watershed_tpu.ops.pallas_relax import relax_packed_planes
    from rustronomy_watershed_tpu.ops.scan_merge import (
        component_min_coarse_from_padded,
    )
    from rustronomy_watershed_tpu.ops.seeds import (
        local_extrema_mask,
        seed_labels_from_mask,
    )

    for shape, frac in (((48, 160), 0.15), ((160, 136), 0.10)):
        img = rng.integers(0, 254, size=shape).astype(np.uint8)
        img[rng.random(shape) < frac] = 255
        lab0 = seed_labels_from_mask(
            local_extrema_mask(jnp.asarray(img, jnp.int32))
        )
        out = relax_packed_planes(
            jnp.asarray(img, jnp.int32), lab0, fwd_scan="stats",
            interpret=True, steps=16,
        )
        lab_pad, p, col_off = out[1], out[2], out[3]
        if (lab_pad.shape[0] - 2 * p) % 16:
            continue
        kw = dict(p=p, h=shape[0], w=shape[1], interpret=True,
                  col_off=col_off)
        monkeypatch.setattr(_sm, "_COARSE_MULTI", False)
        legacy = np.asarray(component_min_coarse_from_padded(lab_pad, **kw))
        monkeypatch.setattr(_sm, "_COARSE_MULTI", True)
        for k in (1, 3, 6):
            monkeypatch.setattr(_sm, "_COARSE_K", k)
            got = np.asarray(component_min_coarse_from_padded(lab_pad, **kw))
            np.testing.assert_array_equal(got, legacy, err_msg=f"k={k}")


def test_coarse_multi_many_band_serpentine(rng, monkeypatch):
    """Hard-geometry coverage for the r12 boundary stencil (the bug class
    the chip-battery fuzz caught at 384², 5/12 trials: the cross-band
    violation check must compare the band's output against the
    NEIGHBOUR'S PLANE values, not the in-window relaxed halo copy).  NB
    the CPU interpret path did NOT reproduce the miscount even on this
    serpentine (the trigger is content/timing specific) — the
    authoritative regression gate is the on-chip battery's content fuzz;
    this test pins the many-band geometry (_multi_tile=8) in CI."""
    import rustronomy_watershed_tpu.ops.scan_merge as _sm

    monkeypatch.setattr(_sm, "_multi_tile", lambda hc: 8)
    h, w = 96, 160
    lab = np.zeros((h, w), np.int32)
    # serpentine corridor: full even rows, alternating end columns connect
    for r in range(1, h - 1, 2):
        lab[r, 1:-1] = 1
    for r in range(2, h - 1, 2):
        c = w - 2 if (r // 2) % 2 == 0 else 1
        lab[r, c] = 1
    idx = np.arange(h * w, dtype=np.int32).reshape(h, w) + 2
    lab = np.where(lab > 0, idx, 0)
    want = np.asarray(component_min_labels(jnp.asarray(lab), use_pallas=False))
    got = np.asarray(
        component_min_labels(
            jnp.asarray(lab), use_pallas=True, interpret=True,
            max_label=int(idx.max()) + 1,
        )
    )
    np.testing.assert_array_equal(got, want)

    # plus random many-band content (the fuzz shape, CPU-sized)
    lab2 = rng.integers(0, 400, size=(96, 136)).astype(np.int32)
    lab2[rng.random(lab2.shape) < 0.35] = 0
    a = np.asarray(component_min_labels(jnp.asarray(lab2), use_pallas=False))
    b = np.asarray(
        component_min_labels(
            jnp.asarray(lab2), use_pallas=True, interpret=True, max_label=512
        )
    )
    np.testing.assert_array_equal(a, b)
