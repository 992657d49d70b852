"""Column-blocked (2-D grid) relax kernel: parity + geometry contracts.

The striped kernel (ops.pallas_relax.relax_block2d) exists for images too
wide for a useful full-width band under the VMEM ceiling (8192² and up —
the reference's large-mosaic scale target, SURVEY §5).  Everything here
pins BIT-identity against the 1-D band engine, which is itself pinned
against the jnp oracle, the level-sweep drivers, and the C++ oracle.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from rustronomy_watershed_tpu.ops.pallas_relax import (
    _STRIPE_HALO,
    relax_packed_planes,
    resolve_stripe_config,
)
from rustronomy_watershed_tpu.ops.scan_merge import (
    component_min_from_padded,
    component_min_labels,
)


def _seeded(rng, h, w, n):
    img = rng.integers(0, 40, (h, w)).astype(np.uint8)
    lab0 = np.zeros((h, w), np.int32)
    k = 1
    for _ in range(n):
        r, c = rng.integers(1, h - 1), rng.integers(1, w - 1)
        if lab0[r, c] == 0:
            lab0[r, c] = k
            k += 1
    return img, lab0


@pytest.mark.parametrize(
    "h,w,nx,cw",
    [
        (96, 320, 2, 256),
        (64, 500, 2, 256),  # non-divisible width: stripe padding inert
        (72, 700, 3, 256),  # three stripes
    ],
)
def test_stripe_relax_matches_band_engine(rng, h, w, nx, cw):
    """Striped fixed point == full-width band fixed point, keys AND labels,
    on the centre slice (the striped plane has a different col_off)."""
    img, lab0 = _seeded(rng, h, w, 12)
    k1, l1, p1, c1, _, s1 = relax_packed_planes(
        img, lab0, steps=8, interpret=True
    )
    k2, l2, p2, c2, _, s2 = relax_packed_planes(
        img, lab0, steps=8, interpret=True, stripes=(nx, cw)
    )
    assert c2 == _STRIPE_HALO
    assert np.array_equal(
        np.asarray(k1)[p1 : p1 + h, c1 : c1 + w],
        np.asarray(k2)[p2 : p2 + h, c2 : c2 + w],
    )
    assert np.array_equal(
        np.asarray(l1)[p1 : p1 + h, c1 : c1 + w],
        np.asarray(l2)[p2 : p2 + h, c2 : c2 + w],
    )
    assert not bool(s1) and not bool(s2)


@pytest.mark.parametrize("dense_seeds", [False, True])
def test_stripe_merging_tail(rng, dense_seeds):
    """Merging tail through the striped plane (fused fwd-scan epilogue +
    component_min_from_padded with col_off) == component_min on the 1-D
    engine's final labels.  dense_seeds=True makes call 1 certify, so the
    y0-riding path is exercised; sparse seeds exercise the fallback fwd
    pass (y0_valid False) — bit-identical either way by construction."""
    h, w = 96, 320
    img = rng.integers(0, 40, (h, w)).astype(np.uint8)
    lab0 = np.zeros((h, w), np.int32)
    if dense_seeds:
        k = 1
        for r in range(4, h - 1, 8):
            for c in range(4, w - 1, 8):
                lab0[r, c] = k
                k += 1
        steps = 96
    else:
        img, lab0 = _seeded(rng, h, w, 8)
        steps = 8
    out = relax_packed_planes(
        img, lab0, steps=steps, interpret=True, stripes=(2, 256),
        fwd_scan=True,
    )
    _, l2, pf, cf, tf, y0, y0v, _mstats, _ = out
    if dense_seeds:
        assert bool(y0v)  # one-call certify: y0 rode the relax call
    merged = component_min_from_padded(
        l2, p=pf, h=h, w=w, tile=tf, interpret=True, y0=y0, y0_valid=y0v,
        col_off=cf,
    )
    k1, l1, p1, c1, _, _ = relax_packed_planes(
        img, lab0, steps=steps, interpret=True
    )
    ref = np.asarray(l1)[p1 : p1 + h, c1 : c1 + w]
    want = component_min_labels(
        jnp.asarray(ref), use_pallas=True, interpret=True
    )
    assert np.array_equal(np.asarray(merged), np.asarray(want))


def test_stripe_fused_pack_geometry(rng):
    """labels0=None routes the fused pack kernel through the stripe
    geometry (col_off = _STRIPE_HALO) — seeds, numbering, and the fixed
    point must bit-match the 1-D band path."""
    img = rng.integers(0, 255, (96, 320)).astype(np.uint8)
    kA, lA, pA, cA, _, _ = relax_packed_planes(
        img, None, steps=8, interpret=True
    )
    kB, lB, pB, cB, _, _ = relax_packed_planes(
        img, None, steps=8, interpret=True, stripes=(2, 256)
    )
    assert np.array_equal(
        np.asarray(lA)[pA : pA + 96, cA : cA + 320],
        np.asarray(lB)[pB : pB + 96, cB : cB + 320],
    )
    assert np.array_equal(
        np.asarray(kA)[pA : pA + 96, cA : cA + 320],
        np.asarray(kB)[pB : pB + 96, cB : cB + 320],
    )


def test_stripe_config_validation(rng):
    img, lab0 = _seeded(rng, 40, 300, 4)
    with pytest.raises(ValueError, match="stripe grid"):
        relax_packed_planes(
            img, lab0, steps=8, interpret=True, stripes=(2, 128)
        )  # nx*cw = 256 < 300
    with pytest.raises(ValueError, match="stripe grid"):
        relax_packed_planes(
            img, lab0, steps=8, interpret=True, stripes=(2, 192)
        )  # cw not a 128-multiple


def test_stripe_resolution():
    """Auto-resolution contracts: stripes engage at 8192 (modeled window
    redundancy 1.26 < the VMEM-capped band's 1.47) and stay off at every
    measured width <= 4096; steps above the lane halo disable striping;
    the env override forces a grid."""
    assert resolve_stripe_config(4096, 4096) is None
    assert resolve_stripe_config(2048, 2048) is None
    assert resolve_stripe_config(1024, 1024) is None
    cfg = resolve_stripe_config(8192, 8192)
    assert cfg is not None
    steps, tile, nx, cw = cfg
    assert steps == 32 and nx * cw >= 8192 and cw % 128 == 0
    assert tile >= 256  # taller than the 1-D band's VMEM-capped 152
    assert resolve_stripe_config(8192, 8192, steps=256) is None

    import os

    os.environ["RWT_RELAX_STRIPES"] = "4,2048"
    try:
        cfg = resolve_stripe_config(8192, 8192)
        assert cfg is not None and cfg[2:] == (4, 2048)
        os.environ["RWT_RELAX_STRIPES"] = "0"
        assert resolve_stripe_config(8192, 8192) is None
    finally:
        del os.environ["RWT_RELAX_STRIPES"]
