"""Runtime resilience to Mosaic scoped-VMEM footprint drift (VERDICT r3 #3).

The platform toolchain can inflate the scoped-VMEM footprint of an
UNCHANGED kernel between sessions (measured r7: +0.73 MiB on the identical
win=216x8320 config), turning VMEM-marginal tile configurations (the 8192²
table entries) into compile-time OOMs.  ops/pallas_relax.py keeps a
session-wide derate that _compat.cache_resilient widens whenever a public
entry's compile dies with a scoped-allocation OOM; the retry re-resolves a
smaller band tile down the auto_tile schedule.  These tests force the
failure (no TPU needed — the error is synthesised) and pin the degradation
path end to end.
"""

import warnings

import pytest

from rustronomy_watershed_tpu import _compat
from rustronomy_watershed_tpu.ops import pallas_relax as pr


@pytest.fixture(autouse=True)
def _clean_derate():
    pr._reset_vmem_derate()
    yield
    pr._reset_vmem_derate()


def _mosaic_oom_error():
    # Representative of Mosaic's scoped-allocation OOM report (the exact
    # text varies across toolchain versions; _is_vmem_oom matches loosely).
    return RuntimeError(
        "Mosaic failed to compile TPU kernel: Scoped allocation of "
        "129043200 bytes exceeds the scoped vmem limit"
    )


def test_is_vmem_oom_matcher():
    assert _compat._is_vmem_oom(_mosaic_oom_error())
    assert _compat._is_vmem_oom(
        RuntimeError("RESOURCE_EXHAUSTED: Ran out of memory in memory "
                     "space vmem while compiling")
    )
    assert not _compat._is_vmem_oom(ValueError("shapes do not match"))
    assert not _compat._is_vmem_oom(RuntimeError("HBM OOM allocating 2GB"))


def test_stepdown_recovers_and_shrinks_budget():
    """cache_resilient + the registered relax hook: an entry whose compile
    OOMs until the budget drops by two steps succeeds on the third attempt,
    with the derate retained for the session (later calls resolve smaller
    tiles immediately)."""
    full = pr.VMEM_LIMIT_BYTES
    calls = []

    def entry():
        calls.append(pr.vmem_budget())
        if pr.vmem_budget() > full - 2 * pr._VMEM_DERATE_STEP:
            raise _mosaic_oom_error()
        return "ok"

    wrapped = _compat.cache_resilient(entry)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert wrapped() == "ok"
    assert len(calls) == 3
    assert calls[0] == full and calls[-1] == full - 2 * pr._VMEM_DERATE_STEP
    assert any("drift" in str(x.message) for x in w)
    # The derate is session-sticky: a fresh call sees the shrunken budget.
    assert pr.vmem_budget() == full - 2 * pr._VMEM_DERATE_STEP


def test_stepdown_exhaustion_reraises():
    def entry():
        raise _mosaic_oom_error()

    wrapped = _compat.cache_resilient(entry)
    with pytest.raises(RuntimeError, match="Scoped allocation"), \
            warnings.catch_warnings():
        warnings.simplefilter("ignore")
        wrapped()
    assert pr.vmem_budget() == pr.VMEM_LIMIT_BYTES - pr._VMEM_DERATE_MAX


def test_non_vmem_errors_pass_through_unretried():
    calls = []

    def entry():
        calls.append(1)
        raise RuntimeError("unrelated kernel panic")

    with pytest.raises(RuntimeError, match="unrelated"):
        _compat.cache_resilient(entry)()
    assert len(calls) == 1
    assert pr.vmem_budget() == pr.VMEM_LIMIT_BYTES


def test_8192_configs_survive_simulated_drift():
    """The VMEM-marginal 8192² table entries must keep resolving (smaller,
    monotonically non-increasing tiles — never a ValueError) at every
    derate step, for both the segmenting and the fused-merging variants,
    and the resolved tile must fit the derated budget model."""
    from rustronomy_watershed_tpu.ops.tune import RELAX_TILE_TABLE

    w = 8192
    for fwd in (False, True):
        pr._reset_vmem_derate()
        prev = None
        for _ in range(pr._VMEM_DERATE_MAX // pr._VMEM_DERATE_STEP + 1):
            steps, tile = pr.resolve_relax_config(w, w, fwd_scan=fwd)
            assert tile >= steps
            assert pr.vmem_model_bytes(w, steps, tile, fwd) <= pr.vmem_budget()
            if prev is not None:
                assert tile <= prev
            prev = tile
            if not pr._vmem_drift_stepdown():
                break
        # At full derate the resolved tile sits strictly below the
        # undrifted table entry (the degradation actually engaged).
        assert prev < RELAX_TILE_TABLE[w]

    # The striped (column-blocked) resolution degrades too.
    pr._reset_vmem_derate()
    cfg0 = pr.resolve_stripe_config(w, w)
    assert cfg0 is not None
    while pr._vmem_drift_stepdown():
        pass
    cfg = pr.resolve_stripe_config(w, w)
    if cfg is not None:  # striping may disengage entirely — also graceful
        # NB the derated model may legitimately pick NARROWER stripes with
        # TALLER tiles (smaller window width restores band height), so the
        # invariant is fit-under-budget, not tile monotonicity.
        s2, t2, nx2, cw2 = cfg
        assert pr.vmem_model_bytes2d(cw2, s2, t2) <= pr.vmem_budget()
