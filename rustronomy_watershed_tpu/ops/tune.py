"""Measured relax-kernel configurations (round-4 perf sweep on TPU v5e).

``steps`` (fused sweeps per kernel call) is the schedule-defining knob for
the relax engine: the fixed point needs ~O(longest claim chain) sweeps
(measured: ~29 at 4096² on dense random fields), and the kernel's early
exit (ops.pallas_relax one_sweep loop) makes over-provisioned steps nearly
free — a band stops sweeping the moment a sweep changes nothing.  Choosing
steps *above* the typical chain length therefore lets the whole transform
converge (and certify, via the pipelined last-sweep witness) in ONE dense
kernel call instead of two-plus-certify, halving the relax phase's HBM
rounds.  Measured at 4096²: steps=16 → 1096, 24 → 964, 32 → 1242, 40 →
1093 Mpix/s (too-wide halos re-lose the win to window DMA overhead).

``tile`` (band height) stays governed by the VMEM-fit bound
(ops.pallas_relax.auto_tile); the sweep found no configuration where a
sub-VMEM-cap tile beat the largest fitting one.

The table is keyed by image-width bucket (next power of two).  Unlisted
buckets fall back to the nearest measured bucket.  Override per call with
the explicit ``steps=``/``tile=`` arguments, or process-wide with the
``RWT_RELAX_STEPS`` env var (used by perf triage, not needed in normal
operation).
"""

from __future__ import annotations

import os

# width bucket -> steps.  Measured on v5e (see BENCHMARKS.md round 4);
# validated within ~5% of the best swept config at each size.
RELAX_STEPS_TABLE: dict[int, int] = {
    # r6 sweep with the whole-image band (tile 1024): 24/28/32/40 ->
    # 2084/2066/2060/2033 segmenting, and 24 also wins merging (1607 vs
    # 1583) — shorter chains at this size make the slimmer halo pay.
    1024: 24,
    2048: 32,
    4096: 32,
    8192: 32,
}

# width bucket -> band tile, MEASURED with the table's steps (these are the
# exact configurations the round-4 bench matrix ran: 1367/1382/1252/1322
# Mpix/s).  For listed buckets the VMEM-fit heuristic
# (ops.pallas_relax.auto_tile, ~80 B per window element) is therefore not
# perf-governing — it remains only the fallback bound for widths nobody has
# measured (where a Mosaic footprint change would surface as a compile-time
# VMEM error at the 112 MB limit, not silent corruption).
RELAX_TILE_TABLE: dict[int, int] = {
    # r6 tall-tile sweep at the 123 MiB ceiling (values above the generic
    # DEFAULT_TILE cap are deliberate — halo share drops with band height;
    # relax_packed_planes clamps by the image HEIGHT so a width-keyed tall
    # tile never inflates a shorter image):
    # 1024: 256/512/1024 -> 1966/2017/2043 (whole image, one band).
    1024: 1024,
    # 2048: 320/384/512 -> 1861/1873/1990 all lose to 256's 2001 — keep 256.
    2048: 256,
    # 4096: 240 -> 256 -> 320 = 1845.9 -> 1857.6 -> 1912.6 segmenting
    # (merging 1541.6 -> 1542.0, neutral); 352 regresses to 1862 (VMEM
    # pressure near the ceiling), 384 does not fit.
    4096: 320,
    # r6 sweep at the 123 MiB scoped-VMEM limit (VMEM_LIMIT_BYTES):
    # 136/144/152/160 -> 1691/1740/1781/1784 Mpix/s; 168 does not fit.
    # r7: tile 152 transiently OOM'd by 66 KiB at the old 123 MiB ceiling —
    # PLATFORM COMPILER DRIFT, not a kernel change (the exact r6 kernel
    # revision reproduces it; see the _WIN_ELEM_BYTES_X10 note).  Restored
    # after the ceiling raise to 125 MiB (compile+run verified at the
    # drifted footprint; tile 144 measured 1731 as the interim).
    # (r5 history at the old 112 MiB limit: 88/120/128/136 ->
    # 1413/1539/1615/1608.)
    8192: 152,
}

# width -> (nx, cw, tile) for the column-blocked (2-D grid) relax kernel
# (ops.pallas_relax.resolve_stripe_config).  A listed width ALWAYS stripes
# with this exact configuration; unlisted widths fall back to the modeled
# redundancy comparison (stripes engage when the model says column blocking
# beats the VMEM-capped full-width band — first true around w ≈ 5k).
# r11 hardware sweep (segmenting Mpix/s, 1-D forced vs the modeled stripe
# config — the model's engage decision measured CORRECT at every width):
#   5120²: 1947.8 vs 1964.8 (+0.9%, marginal — right at the boundary)
#   6144²: 1891.1 vs 1981.6 (+4.8%)
#   8192²: 1774 (r8 1-D) vs 1908.4 (+7.6%; matches r8/r10 1906.8/1908.6)
STRIPE_TABLE: dict[int, tuple[int, int, int]] = {
    5120: (2, 2560, 512),
    6144: (2, 3072, 480),
    8192: (2, 4096, 352),
}

_MIN_STEPS = 8  # Mosaic sublane-DMA slice granularity


def relax_steps(width: int) -> int:
    """Tuned fused-sweep count for this image width."""
    env = os.environ.get("RWT_RELAX_STEPS")
    if env:
        # Round UP to the Mosaic DMA granularity (same convention as the
        # tiled halo's _round_up8) so the override is never silently weaker
        # than requested.
        return max(_MIN_STEPS, -(-int(env) // 8) * 8)
    bucket = 1 << max(0, (width - 1).bit_length())
    if bucket in RELAX_STEPS_TABLE:
        return RELAX_STEPS_TABLE[bucket]
    keys = sorted(RELAX_STEPS_TABLE)
    nearest = min(keys, key=lambda k: abs(k - bucket))
    return RELAX_STEPS_TABLE[nearest]


def relax_tile(width: int, steps: int) -> int | None:
    """Measured band tile for (width, steps), or None when unmeasured (the
    caller falls back to the auto_tile VMEM bound).  Only EXACT width
    matches count: the tables were measured at the bucket widths themselves,
    and a tile tuned for width W can exceed the VMEM budget at W' > W."""
    if os.environ.get("RWT_RELAX_STEPS") or os.environ.get("RWT_RELAX_TILE"):
        env = os.environ.get("RWT_RELAX_TILE")
        return int(env) if env else None
    if width in RELAX_TILE_TABLE and steps == RELAX_STEPS_TABLE.get(width):
        return RELAX_TILE_TABLE[width]
    return None
