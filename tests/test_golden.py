"""Committed golden fixtures: every engine must bit-match tests/golden/.

The fixtures pin the agreed semantics of four independent implementations
(see tests/golden/README.md for provenance); a regression in ANY engine —
or an accidental semantic change — breaks against the frozen files.
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from rustronomy_watershed_tpu.ops import paint_seeds, run_levels
from rustronomy_watershed_tpu.ops.merge_curve import relax_merging_sizes

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "golden_v1.npz")
FIELDS = ("uniform", "poisson", "grf", "nanmasked")


@pytest.fixture(scope="module")
def golden():
    return np.load(GOLDEN)


@pytest.mark.parametrize("field", FIELDS)
@pytest.mark.parametrize("merging", [False, True])
def test_device_engines_match_golden(golden, field, merging):
    img = golden[f"{field}/img"]
    seeds = [tuple(s) for s in golden[f"{field}/seeds"]]
    variant = "merging" if merging else "segmenting"
    want = golden[f"{field}/{variant}/labels"]
    lab0 = paint_seeds(img.shape, seeds)
    for backend in ("jnp", "relax"):
        got = np.asarray(
            run_levels(jnp.asarray(img), lab0, n_labels=len(seeds),
                       max_water_level=254, merging=merging, backend=backend)
        )
        np.testing.assert_array_equal(got, want, err_msg=f"{field} {backend}")


@pytest.mark.parametrize("field", FIELDS)
def test_merging_sizes_match_golden(golden, field):
    img = golden[f"{field}/img"]
    seeds = [tuple(s) for s in golden[f"{field}/seeds"]]
    want = golden[f"{field}/merging/sizes"]
    lab0 = paint_seeds(img.shape, seeds)
    _, sizes, _ = relax_merging_sizes(
        jnp.asarray(img), lab0, n_labels=len(seeds), max_water_level=254,
        backend="relax",
    )
    np.testing.assert_array_equal(np.asarray(sizes), want)


@pytest.mark.parametrize("field", FIELDS)
def test_segmenting_sizes_match_golden(golden, field):
    img = golden[f"{field}/img"]
    seeds = [tuple(s) for s in golden[f"{field}/seeds"]]
    want = golden[f"{field}/segmenting/sizes"]
    lab0 = paint_seeds(img.shape, seeds)
    _, sizes = run_levels(
        jnp.asarray(img), lab0, n_labels=len(seeds), max_water_level=254,
        merging=False, collect="sizes", backend="relax",
    )
    np.testing.assert_array_equal(np.asarray(sizes), want)


def test_native_oracle_matches_golden(golden):
    native = pytest.importorskip("rustronomy_watershed_tpu.parity.native")
    img = golden["uniform/img"]
    seeds = [tuple(s) for s in golden["uniform/seeds"]]
    for merging in (False, True):
        variant = "merging" if merging else "segmenting"
        got = native.native_transform(img, seeds, 254, merging=merging)
        np.testing.assert_array_equal(got, golden[f"uniform/{variant}/labels"])


def test_edge_correction_matches_golden(golden):
    from rustronomy_watershed_tpu.prelude import TransformBuilder

    img = golden["uniform/img"]
    seeds = [tuple(s) for s in golden["edge/seeds"]]
    want = golden["edge/merging/labels"]
    ws = TransformBuilder.default().enable_edge_correction().build_merging()
    got = ws.transform(img, seeds)
    np.testing.assert_array_equal(got, want)


def test_heap_oracle_still_regenerates_golden(golden):
    # The generator itself must still reproduce the committed file (guards
    # against silent drift in the independent oracle).
    from rustronomy_watershed_tpu.parity.heap_oracle import heap_transform

    img = golden["nanmasked/img"]
    seeds = [tuple(s) for s in golden["nanmasked/seeds"]]
    labels, sizes = heap_transform(img, seeds, 254, merging=True, with_sizes=True)
    np.testing.assert_array_equal(labels, golden["nanmasked/merging/labels"])
    np.testing.assert_array_equal(sizes, golden["nanmasked/merging/sizes"])


# ---------------------------------------------------------------------------
# Real-morphology golden (golden_morph_v1.npz, VERDICT r4 missing #1): a
# beam-smoothed plateau-heavy 1024² field with a blob-NaN coverage mask —
# the committed-fixture equivalent of the reference's smoothed-CGPS
# integration case (/root/reference/tests/integration.rs:517-602), generated
# by tools/gen_golden_morph.py from the native C++ oracle.
# ---------------------------------------------------------------------------

GOLDEN_MORPH = os.path.join(
    os.path.dirname(__file__), "golden", "golden_morph_v1.npz"
)


@pytest.fixture(scope="module")
def golden_morph():
    return np.load(GOLDEN_MORPH)


@pytest.mark.parametrize("merging", [False, True])
def test_morph_golden_relax_engine(golden_morph, merging):
    """Production relax engine vs the committed smoothed+blob-NaN field at
    full 254-level depth.  The merging run exercises the general scan tail
    (11% NEVER_FILL blobs -> unclaimed interior -> no broadcast shortcut)."""
    img = golden_morph["img"]
    seeds = [tuple(s) for s in golden_morph["seeds"]]
    variant = "merging" if merging else "segmenting"
    want = golden_morph[f"{variant}/labels"]
    lab0 = paint_seeds(img.shape, seeds)
    got = np.asarray(
        run_levels(jnp.asarray(img), lab0, n_labels=len(seeds),
                   max_water_level=254, merging=merging, backend="relax")
    )
    np.testing.assert_array_equal(got, want)


def test_morph_golden_native_oracle_regenerates(golden_morph):
    """Regen guard: a fresh native-oracle run still reproduces the frozen
    fixture (catches drift in the oracle or the committed field build)."""
    native = pytest.importorskip("rustronomy_watershed_tpu.parity.native")
    import sys

    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools")
    )
    try:
        from gen_golden_morph import build_field
    finally:
        sys.path.pop(0)
    img = build_field()
    np.testing.assert_array_equal(img, golden_morph["img"])
    seeds = [tuple(s) for s in golden_morph["seeds"]]
    assert native.native_find_local_minima(img) == seeds
    mrg, sizes = native.native_transform(
        img, seeds, 254, merging=True, with_sizes=True
    )
    np.testing.assert_array_equal(mrg, golden_morph["merging/labels"])
    np.testing.assert_array_equal(sizes, golden_morph["merging/sizes"])
