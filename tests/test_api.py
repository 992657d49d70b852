"""Public-surface tests: builder validation, hooks, prelude, observability."""

import jax
import numpy as np
import pytest

import rustronomy_watershed_tpu as wst
from rustronomy_watershed_tpu import BuildErr, TransformBuilder
from rustronomy_watershed_tpu.prelude import (
    MergingWatershed,
    SegmentingWatershed,
    WatershedUtils,
    color_maps,
)


def test_constants():
    assert wst.UNCOLOURED == 0
    assert wst.NORMAL_MAX == 254
    assert wst.ALWAYS_FILL == 0
    assert wst.NEVER_FILL == 255


def test_builder_validation():
    # 0 < max_water_level <= 254 (src/lib.rs:999-1004)
    with pytest.raises(BuildErr) as e:
        TransformBuilder.default().set_max_water_lvl(255).build_segmenting()
    assert e.value.kind == BuildErr.MAX_TOO_HIGH
    with pytest.raises(BuildErr) as e:
        TransformBuilder.default().set_max_water_lvl(0).build_merging()
    assert e.value.kind == BuildErr.MAX_TOO_LOW
    assert isinstance(
        TransformBuilder.new().set_max_water_lvl(254).build_merging(), MergingWatershed
    )
    assert isinstance(
        TransformBuilder.default().build_segmenting(), SegmentingWatershed
    )


def test_default_max_water_level():
    ws = TransformBuilder.default().build_segmenting()
    assert ws.max_water_level == 254


def test_hook_called_every_level(rng):
    img = rng.integers(0, 8, size=(10, 10)).astype(np.uint8)
    levels_seen = []

    def hook(ctx):
        levels_seen.append(ctx.water_level)
        assert ctx.max_water_level == 6
        assert ctx.image.shape == img.shape
        assert ctx.colours.shape == img.shape
        return int(ctx.colours.max())

    ws = TransformBuilder.new().set_max_water_lvl(6).set_wlvl_hook(hook).build_segmenting()
    seeds = ws.find_local_minima(img)
    out = ws.transform_with_hook(img, seeds)
    assert levels_seen == list(range(7))
    assert len(out) == 7
    assert out[-1] <= len(seeds)


def test_hook_seeds_have_original_colours(rng):
    img = rng.integers(0, 8, size=(10, 10)).astype(np.uint8)
    captured = {}

    def hook(ctx):
        captured["seeds"] = ctx.seeds
        return None

    ws = TransformBuilder.new().set_max_water_lvl(2).set_wlvl_hook(hook).build_merging()
    seeds = ws.find_local_minima(img)
    ws.transform_with_hook(img, seeds)
    assert captured["seeds"] == tuple(
        (i + 1, (y, x)) for i, (y, x) in enumerate(seeds)
    )


def test_no_hook_returns_empty(rng):
    img = rng.integers(0, 8, size=(10, 10)).astype(np.uint8)
    ws = TransformBuilder.default().set_max_water_lvl(4).build_segmenting()
    assert ws.transform_with_hook(img, ws.find_local_minima(img)) == []


def test_hook_path_matches_fast_path(rng):
    img = rng.integers(0, 10, size=(12, 12)).astype(np.uint8)
    ws = TransformBuilder.default().set_max_water_lvl(9).build_merging()
    seeds = ws.find_local_minima(img)
    fast = ws.transform(img, seeds)

    def hook(ctx):
        return ctx.colours.copy()

    ws2 = TransformBuilder.new().set_max_water_lvl(9).set_wlvl_hook(hook).build_merging()
    hooked = ws2.transform_with_hook(img, seeds)
    np.testing.assert_array_equal(fast, hooked[-1])


def test_hook_replay_matches_host_loop(rng):
    """The fast-observer replay (compact-plane snapshots) must hand hooks
    the exact per-level views the host-stepped loop does — both variants,
    with and without edge correction.  Forcing backend='jnp' on the
    reference side disqualifies the replay, so this really compares the
    two paths."""
    from rustronomy_watershed_tpu.prelude import TransformBuilder

    img = rng.integers(0, 16, size=(30, 26)).astype(np.uint8)

    def hook(ctx):
        return (ctx.water_level, ctx.colours.copy(), ctx.image.copy(), ctx.seeds)

    for build in ("build_segmenting", "build_merging"):
        for edge in (False, True):
            def mk(backend=None):
                b = TransformBuilder.default().set_max_water_lvl(15)
                if edge:
                    b = b.enable_edge_correction()
                if backend:
                    b = b.set_backend(backend)
                return getattr(b.set_wlvl_hook(hook), build)()

            fast = mk()
            assert fast._fast_observer_ok()
            slow = mk("jnp")
            assert not slow._fast_observer_ok()
            seeds = fast.find_local_minima(img)
            a = fast.transform_with_hook(img, seeds)
            b = slow.transform_with_hook(img, seeds)
            assert len(a) == len(b) == 16
            for (la, ca, ia, sa), (lb, cb, ib, sb) in zip(a, b):
                assert la == lb and sa == sb
                np.testing.assert_array_equal(ca, cb, err_msg=f"{build} e={edge} l={la}")
                np.testing.assert_array_equal(ia, ib)


def test_plot_replay_matches_host_loop(rng, tmp_path):
    """ws_lvl{N}.png files from the replay path must be byte-identical to
    the host-stepped loop's."""
    from rustronomy_watershed_tpu.prelude import TransformBuilder

    img = rng.integers(0, 8, size=(14, 11)).astype(np.uint8)
    da, db = tmp_path / "a", tmp_path / "b"
    da.mkdir(), db.mkdir()
    fast = (
        TransformBuilder.default().set_max_water_lvl(7)
        .set_plot_folder(da).build_merging()
    )
    slow = (
        TransformBuilder.default().set_max_water_lvl(7)
        .set_plot_folder(db).set_backend("jnp").build_merging()
    )
    seeds = fast.find_local_minima(img)
    fast.transform_with_hook(img, seeds)
    slow.transform_with_hook(img, seeds)
    for lvl in range(8):
        pa, pb = da / f"ws_lvl{lvl}.png", db / f"ws_lvl{lvl}.png"
        assert pa.exists() and pb.exists()
        assert pa.read_bytes() == pb.read_bytes(), f"lvl {lvl}"


def test_watershed_utils_mixin(rng):
    ws = TransformBuilder.default().build_segmenting()
    assert isinstance(ws, WatershedUtils)
    img = rng.normal(size=(8, 8))
    u8 = ws.pre_processor(img)
    assert u8.dtype == np.uint8 and u8.max() <= 255
    u8b = ws.pre_processor_with_max(img, 127)
    normal = u8b[u8b != 255]
    assert normal.max() <= 127


def test_plots_written(tmp_path, rng):
    img = rng.integers(0, 6, size=(9, 9)).astype(np.uint8)
    ws = (
        TransformBuilder.default()
        .set_max_water_lvl(3)
        .set_plot_folder(tmp_path)
        .set_plot_colour_map(color_maps.viridis)
        .build_segmenting()
    )
    ws.transform_with_hook(img, ws.find_local_minima(img))
    for lvl in range(4):
        p = tmp_path / f"ws_lvl{lvl}.png"
        assert p.exists() and p.stat().st_size > 0
        assert p.read_bytes()[:8] == b"\x89PNG\r\n\x1a\n"


def test_colour_maps_signature():
    for cmap in (
        color_maps.grey_scale,
        color_maps.viridis,
        color_maps.magma,
        color_maps.plasma,
        color_maps.inferno,
    ):
        rgb = cmap(5, 0, 10)
        assert len(rgb) == 3 and all(0 <= v <= 255 for v in rgb)
        assert cmap(0, 0, 10) == (0, 0, 0)  # count <= min -> NaN colour


def test_progress_and_debug_paths(rng, capsys):
    img = rng.integers(0, 5, size=(8, 8)).astype(np.uint8)
    ws = (
        TransformBuilder.default()
        .set_max_water_lvl(3)
        .enable_progress()
        .enable_debug()
        .build_segmenting()
    )
    ws.transform_with_hook(img, ws.find_local_minima(img))
    captured = capsys.readouterr()
    assert "Performance Summary" in captured.out
    assert "water level" in captured.err


def test_perf_report_format():
    from rustronomy_watershed_tpu.utils import PerfReport

    p = PerfReport(big_iter_ms=[2, 4], colouring_mus=[100, 300], loops=2, total_ms=10)
    s = str(p)
    assert "Looped 2x" in s and "3.0ms" in s and "200.0µs" in s


def test_checkpoint_resume(tmp_path, rng):
    img = rng.integers(0, 10, size=(12, 12)).astype(np.uint8)
    base = TransformBuilder.default().set_max_water_lvl(9).build_segmenting()
    seeds = base.find_local_minima(img)
    full = base.transform(img, seeds)

    # "Interrupted" run: levels 0..5 only, snapshots at 0 and 3.
    ws = (
        TransformBuilder.default()
        .set_max_water_lvl(5)
        .set_checkpoint(tmp_path, every=3)
        .set_wlvl_hook(lambda ctx: ctx.water_level)
        .build_segmenting()
    )
    assert ws.transform_with_hook(img, seeds) == list(range(6))

    # Resumed run to level 9 starts after the newest snapshot (level 3) and
    # reproduces the uninterrupted result bit-exactly.
    hook_levels = []
    ws2 = (
        TransformBuilder.default()
        .set_max_water_lvl(9)
        .set_checkpoint(tmp_path, every=3)
        .set_wlvl_hook(
            lambda ctx: hook_levels.append(ctx.water_level) or ctx.colours.copy()
        )
        .build_segmenting()
    )
    out2 = ws2.transform_with_hook(img, seeds)
    assert hook_levels[0] == 4  # resumed after the level-3 snapshot
    np.testing.assert_array_equal(out2[-1], full)


def test_tracing_context(tmp_path, rng):
    """On a supporting platform (CPU is one) a trace must leave real XPlane
    artifacts; on one that can't, the context must WARN, not silently yield
    an empty dir (VERDICT r3 #6)."""
    import warnings as _warnings

    from rustronomy_watershed_tpu.utils.tracing import trace, trace_artifacts

    img = rng.integers(0, 5, size=(8, 8)).astype(np.uint8)
    ws = TransformBuilder.default().set_max_water_lvl(3).build_segmenting()
    with _warnings.catch_warnings(record=True) as w:
        _warnings.simplefilter("always")
        with trace(tmp_path):
            ws.transform(img, ws.find_local_minima(img))
    arts = trace_artifacts(tmp_path)
    if arts:
        assert all(a.stat().st_size > 0 for a in arts)
        assert not any(
            issubclass(x.category, RuntimeWarning) and "trace" in str(x.message).lower()
            for x in w
        )
    else:
        assert any(issubclass(x.category, RuntimeWarning) for x in w), (
            "no artifact and no warning: silent trace loss"
        )


def test_debug_perf_report_all_fields(rng, capsys):
    # The debug path must produce bit-identical output to the fast path AND
    # populate every PerfReport field non-trivially (phase instrumentation,
    # src/lib.rs:1404-1470; note lake_count_ms is never assigned upstream —
    # we time the hook into it).
    from rustronomy_watershed_tpu.prelude import TransformBuilder

    img = rng.integers(0, 12, size=(24, 24)).astype(np.uint8)
    fast = TransformBuilder.default().set_max_water_lvl(11).build_merging()
    seeds = fast.find_local_minima(img)
    want = fast.transform_to_list(img, seeds, counts_length=len(seeds) + 1)

    dbg = TransformBuilder.default().set_max_water_lvl(11).enable_debug().build_merging()
    got = dbg.transform_to_list(img, seeds, counts_length=len(seeds) + 1)
    for (la, ca), (lb, cb) in zip(got, want):
        assert la == lb
        np.testing.assert_array_equal(ca, cb)

    out = capsys.readouterr().out
    assert "starting with" in out
    assert "Performance Summary" in out
    # every field appears with a parsed non-trivial value somewhere
    import re

    loops = [int(m) for m in re.findall(r">  Looped (\d+)x", out)]
    assert max(loops) >= 2  # plateaus force >1 colouring iteration somewhere
    merges = [int(m) for m in re.findall(r">  Merging: (\d+)ms", out)]
    assert len(merges) == 12
    lakes = re.findall(r">  Counting Lakes: (\d+)ms", out)
    assert len(lakes) == 12
    iters = re.findall(r">  Iteration Average: ([\d.]+)ms", out)
    assert len(iters) == 12


def test_progress_ticks_per_iteration(rng):
    # Progress mode ticks once per colouring iteration plus inc per level
    # (src/lib.rs:1395-1398, :1503-1507), while output stays bit-identical.
    import io

    from rustronomy_watershed_tpu.prelude import TransformBuilder
    from rustronomy_watershed_tpu.utils import progress as progress_mod

    img = rng.integers(0, 10, size=(24, 24)).astype(np.uint8)
    fast = TransformBuilder.default().set_max_water_lvl(9).build_segmenting()
    seeds = fast.find_local_minima(img)
    want = fast.transform(img, seeds)

    ticks = []
    orig_tick = progress_mod.ProgressBar.tick

    def counting_tick(self):
        ticks.append(1)
        return orig_tick(self)

    progress_mod.ProgressBar.tick = counting_tick
    try:
        ws = (
            TransformBuilder.default()
            .set_max_water_lvl(9)
            .enable_progress()
            .build_segmenting()
        )
        ws.wlvl_hook = lambda ctx: ctx.colours.copy()
        res = ws.transform_with_hook(img, seeds)
    finally:
        progress_mod.ProgressBar.tick = orig_tick
    np.testing.assert_array_equal(res[-1], want)
    # at least one tick per level, strictly more than the level count when
    # plateaus force extra iterations
    assert len(ticks) >= 10


def test_colormap_tables_faithful():
    # The committed tables must match matplotlib's (the same CC0 data the
    # reference hardcodes in color_maps.rs:30-1064) byte-exactly after the
    # u8 conversion — and, when the reference checkout is present, match its
    # hardcoded tables too.
    import os
    import re

    from rustronomy_watershed_tpu.utils.plotting import _table

    try:
        import matplotlib

        for name in ("viridis", "magma", "plasma", "inferno"):
            mine = (_table(name) * 255.999).astype(np.uint8)
            mpl = (
                np.asarray(matplotlib.colormaps[name](np.arange(256) / 255.0))[:, :3]
                * 255.999
            ).astype(np.uint8)
            np.testing.assert_array_equal(mine, mpl)
    except ImportError:
        pass

    ref = "/root/reference/src/plotting/color_maps.rs"
    if os.path.exists(ref):
        src = open(ref).read()
        for name, const in [("magma", "MAGMA"), ("viridis", "VIRIDIS")]:
            m = re.search(
                rf"const {const}: \[\[f32; 3\]; 256\] = \[(.*?)\n\];", src, re.S
            )
            triples = re.findall(r"\[([\d.]+),\s*([\d.]+),\s*([\d.]+)\]", m.group(1))
            want = np.array(triples, dtype=np.float64)
            np.testing.assert_allclose(_table(name), want, atol=1e-6)


def test_native_backend_public_api(rng):
    # backend='native' routes through the C++ engine and matches the device
    # path bit-exactly on both entry points.
    from rustronomy_watershed_tpu.prelude import TransformBuilder

    pytest.importorskip("rustronomy_watershed_tpu.parity.native")
    img = rng.integers(0, 15, size=(32, 32)).astype(np.uint8)
    dev = TransformBuilder.default().set_max_water_lvl(14).build_merging()
    nat = TransformBuilder.default().set_max_water_lvl(14).build_merging()
    nat.backend = "native"
    seeds = dev.find_local_minima(img)
    np.testing.assert_array_equal(nat.transform(img, seeds), dev.transform(img, seeds))
    a = nat.transform_to_list(img, seeds, counts_length=len(seeds) + 1)
    b = dev.transform_to_list(img, seeds, counts_length=len(seeds) + 1)
    for (la, ca), (lb, cb) in zip(a, b):
        assert la == lb
        np.testing.assert_array_equal(ca, cb)


def test_native_backend_history_and_hookless(rng):
    # Regression (r2 review): backend='native' must not crash the paths that
    # need a device driver (transform_history, hookless transform_with_hook).
    from rustronomy_watershed_tpu.prelude import TransformBuilder

    img = rng.integers(0, 8, size=(16, 16)).astype(np.uint8)
    nat = TransformBuilder.default().set_max_water_lvl(7).set_backend("native").build_merging()
    dev = TransformBuilder.default().set_max_water_lvl(7).build_merging()
    seeds = dev.find_local_minima(img)
    assert nat.transform_with_hook(img, seeds) == []
    want = dev.transform_history(img, seeds)
    got = nat.transform_history(img, seeds)
    for (la, ca), (lb, cb) in zip(got, want):
        assert la == lb
        np.testing.assert_array_equal(ca, cb)


def test_checkpoint_resume_after_completion(rng, tmp_path):
    # Regression (r2 review): resuming from a checkpoint saved AT the final
    # water level must return the final labels, not crash on an empty loop.
    from rustronomy_watershed_tpu.prelude import TransformBuilder

    img = rng.integers(0, 8, size=(16, 16)).astype(np.uint8)
    plain = TransformBuilder.default().set_max_water_lvl(7).build_segmenting()
    seeds = plain.find_local_minima(img)
    want = plain.transform(img, seeds)

    ws = (
        TransformBuilder.default()
        .set_max_water_lvl(7)
        .set_checkpoint(str(tmp_path), every=1)
        .build_segmenting()
    )
    first = ws.transform(img, seeds)
    np.testing.assert_array_equal(first, want)
    again = ws.transform(img, seeds)  # resumes from the final snapshot
    np.testing.assert_array_equal(again, want)


def test_transform_device_output(rng):
    # device_output=True returns a device array (no host transfer) with the
    # same values as the default numpy return.
    img = rng.integers(0, 10, size=(20, 20)).astype(np.uint8)
    ws = TransformBuilder.default().set_max_water_lvl(9).build_segmenting()
    seeds = ws.find_local_minima(img)
    host = ws.transform(img, seeds)
    dev = ws.transform(img, seeds, device_output=True)
    assert isinstance(host, np.ndarray)
    assert isinstance(dev, jax.Array)
    np.testing.assert_array_equal(np.asarray(dev), host)
    # native backend honours the flag too
    wsn = (
        TransformBuilder.default().set_max_water_lvl(9).set_backend("native")
        .build_segmenting()
    )
    devn = wsn.transform(img, seeds, device_output=True)
    assert isinstance(devn, jax.Array)
    np.testing.assert_array_equal(np.asarray(devn), host)


def test_to_list_copy_kwarg_gives_independent_rows():
    """``transform_to_list(copy=True)`` must return rows that do not alias
    a shared base (the documented >64 MB view-aliasing trade, docs/API.md);
    parity with the default path is bit-exact."""
    import numpy as np

    from rustronomy_watershed_tpu.models.base import _expand_rows
    from rustronomy_watershed_tpu.prelude import TransformBuilder

    rng = np.random.default_rng(3)
    img = rng.integers(0, 40, size=(24, 24)).astype(np.uint8)
    ws = TransformBuilder.default().build_merging()
    seeds = ws.find_local_minima(img)
    a = ws.transform_to_list(img, seeds)
    b = ws.transform_to_list(img, seeds, copy=True)
    assert len(a) == len(b)
    for (la, ra), (lb, rb) in zip(a, b):
        assert la == lb
        np.testing.assert_array_equal(ra, rb)
        assert rb.base is None  # independent allocation

    # The >64 MB tier ships views by default and copies under copy=True
    # (unit-level: the public path needs a ~2 GB result to reach it).
    big = np.zeros((2, 9), dtype=np.int64)
    view_rows = _expand_rows(big, 5_000_000, 1)
    assert view_rows[0][1].base is not None
    copy_rows = _expand_rows(big, 5_000_000, 1, copy=True)
    assert copy_rows[0][1].base is None
