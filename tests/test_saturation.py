"""d-field saturation detection + exact-engine fallback (VERDICT r2 #4).

The packed-key relax kernel carries the plateau ring index in a 23-bit
field; a single >= 2^23-px equal-level serpentine plateau saturates it and
label donation starves (claims complete at the pinned key, but donation
needs a STRICTLY smaller neighbour key — ops/pallas_relax.py module
docstring).  Reference semantics colour every reachable ``img <= lvl``
pixel (/root/reference/src/lib.rs:224-231).

A real trigger needs ~8.4M plateau rings — ~8.4M Jacobi sweeps on ANY
engine (including the reference), so no full-size run is practical
anywhere.  These tests scale the field width down (monkeypatched _D_BITS=7,
saturation at ring 127) and drive the detection + fallback machinery
end-to-end through the public API on a ~700-ring serpentine; the
full-width arithmetic is identical (same saturating-extend code path,
pinned by test_relax_pallas_d_field_saturates_instead_of_carrying).
"""

import numpy as np
import pytest

from rustronomy_watershed_tpu.prelude import TransformBuilder


def _serpentine(h=41, w=38, lvl=5):
    """A one-pixel-wide serpentine corridor at a single level (a monster
    plateau in miniature): ~h*w/2 rings from the single seed at the start.
    Everything else is NEVER_FILL."""
    img = np.full((h, w), 255, dtype=np.uint8)
    for i, y in enumerate(range(1, h - 1, 2)):
        img[y, 1 : w - 1] = lvl
        if y + 2 < h - 1:
            # connect alternating ends
            x = w - 2 if i % 2 == 0 else 1
            img[y + 1, x] = lvl
    return img


def _patch_7bit(monkeypatch):
    import rustronomy_watershed_tpu.ops.pallas_relax as prx

    monkeypatch.setattr(prx, "_D_BITS", 7)
    monkeypatch.setattr(prx, "_D_MASK", (1 << 7) - 1)
    monkeypatch.setattr(prx, "_UNCLAIMED", 255 << 7)


def _pallas_model(build):
    ws = build()
    ws.backend = "relax_pallas"
    ws._interpret = True  # Mosaic interpret mode (CPU test environment)
    return ws


def test_transform_saturation_fallback_matches_exact_engine(monkeypatch):
    _patch_7bit(monkeypatch)
    img = _serpentine()
    seeds = [(1, 1)]
    ws = _pallas_model(TransformBuilder.default().build_segmenting)
    with pytest.warns(RuntimeWarning, match="saturation"):
        got = np.asarray(ws.transform(img, seeds))
    # Exact engine ground truth: the whole corridor floods from the seed.
    ws_exact = TransformBuilder.default().set_backend("relax").build_segmenting()
    want = np.asarray(ws_exact.transform(img, seeds))
    np.testing.assert_array_equal(got, want)
    # The corridor really is deep enough to saturate a 7-bit ring index...
    assert (img == 5).sum() > 600
    # ...and reference semantics hold: every corridor pixel is coloured.
    assert (got[img == 5] == 1).all()


def test_transform_to_list_saturation_fallback(monkeypatch):
    _patch_7bit(monkeypatch)
    img = _serpentine()
    seeds = [(1, 1)]
    wm = _pallas_model(TransformBuilder.default().build_merging)
    with pytest.warns(RuntimeWarning, match="saturation"):
        got = wm.transform_to_list(img, seeds, counts_length=2)
    wm_exact = TransformBuilder.default().set_backend("jnp").build_merging()
    want = wm_exact.transform_to_list(img, seeds, counts_length=2)
    for (gl, gc), (wl, wc) in zip(got, want):
        assert gl == wl
        np.testing.assert_array_equal(gc, wc)


def test_no_false_positive_on_normal_fields():
    """The detector must stay silent on ordinary content (and the bench
    path's in-kernel cost is the only cost — no warning, no fallback)."""
    import warnings

    rng = np.random.default_rng(3)
    img = rng.integers(0, 60, size=(48, 48)).astype(np.uint8)
    ws = _pallas_model(TransformBuilder.default().build_segmenting)
    seeds = ws.find_local_minima(img)
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        out = np.asarray(ws.transform(img, seeds))
    assert out.max() >= 1
