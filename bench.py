"""Headline benchmark: watershed throughput on one TPU chip.

BASELINE.md metric: 4096x4096 u8 uniform random field, seeds from
find_local_minima, full 255-level segmenting transform, Mpix/s per chip.
North-star target (the reference publishes no numbers): 500 Mpix/s.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Mpix/s", "vs_baseline": N/500}

Timing note (tunnelled TPU platform): a single host->device->host dispatch
costs ~26 ms of pure tunnel latency (measured: a trivial 4-byte scalar fetch)
and ~13 ms of it does not pipeline away across dispatches — both are
properties of the development tunnel, not the chip.  Throughput is therefore
measured steady-state: BENCH_INNER back-to-back transforms run inside ONE
jitted program (a lax.fori_loop whose iterations are serially
data-dependent, so XLA cannot CSE or overlap them), forced by one scalar
fetch at the end.  Each iteration computes an int32 weighted checksum of its
label image (sum + position-hashed sum, exact modular arithmetic — no float
collisions); determinism is asserted across all iterations and outer reps.
"""

import json
import os
import sys
import time

# Self-heal against zombie TPU-tunnel claims: re-exec once under ``python -S``
# and register a finite-claim session (see tools/axon_boot.py).  A plain
# environment (no axon plugin) is unaffected — boot() is a no-op there.
if (
    os.environ.get("JAX_PLATFORMS") == "axon"
    and os.environ.get("RWT_AXON_BOOTED") != "1"
    and os.path.exists("/opt/axon/libaxon_pjrt.so")
):
    env = dict(os.environ, RWT_AXON_BOOTED="1")
    os.execve(
        sys.executable, [sys.executable, "-S", os.path.abspath(__file__)], env
    )

if os.environ.get("RWT_AXON_BOOTED") == "1":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from tools.axon_boot import boot

    boot()

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from functools import partial

    from rustronomy_watershed_tpu.ops.pipeline import watershed_e2e_impl

    size = int(os.environ.get("BENCH_SIZE", "4096"))
    max_lvl = int(os.environ.get("BENCH_LEVELS", "254"))
    merging = os.environ.get("BENCH_MERGING", "0") == "1"
    backend = os.environ.get("BENCH_BACKEND", "relax_pallas")
    reps = int(os.environ.get("BENCH_REPS", "3"))
    # Default inner count amortises the one ~26 ms tunnel dispatch per
    # outer rep to ~1% of the measurement: inner ≈ 26 ms / (1% · T_est),
    # with T_est planned at ~1.3 Gpix/s.  (The r4 formula 8·(4096/size)²
    # left a 3.25 ms/iter dispatch share at 4096² — 24% of the measured
    # time; measured effect of amortising it: 1252 → 1627 Mpix/s.)
    t_est_ms = size * size / 1.3e6
    inner_default = int(max(64, min(4096, round(2600.0 / t_est_ms))))
    inner = int(os.environ.get("BENCH_INNER", str(inner_default)))
    tile_env = os.environ.get("BENCH_TILE")
    tile = int(tile_env) if tile_env else None
    steps_env = os.environ.get("BENCH_STEPS")
    # Default None = the measured schedule (ops.tune) — what users get.
    steps = int(steps_env) if steps_env else None

    # Hardware parity gate: every bench run first re-certifies the chip with
    # chip_selftest checks 1-2 (seed numbering + fused pack vs host NumPy).
    # The probe MUST run at >= 2048²: the bf16-truncation hazard class this
    # certifies only manifests once blocked row totals exceed 256 (PARITY.md
    # "Platform hazard log") — a smaller probe stays green across exactly
    # the regression it exists to catch.  Opt out with BENCH_SELFTEST=0.
    # Logs ride stderr so stdout stays the single JSON line the driver
    # parses.
    log = lambda msg: print(f"selftest: {msg}", file=sys.stderr)  # noqa: E731
    if os.environ.get("BENCH_SELFTEST", "1") == "0":
        log("skipped (BENCH_SELFTEST=0)")
    elif jax.devices()[0].platform != "tpu":
        log(f"skipped (platform={jax.devices()[0].platform}, gate is TPU-only)")
    else:
        from tools.chip_selftest import numbering_and_pack_checks

        if not numbering_and_pack_checks(
            np.random.default_rng(12345), 2048, log=log
        ):
            print(
                "selftest: HARDWARE PARITY FAILURE — refusing to time",
                file=sys.stderr,
            )
            return 1
        log("hardware parity gate passed")

    rng = np.random.default_rng(0)
    img = rng.integers(0, 254, size=(size, size)).astype(np.uint8)
    # BENCH_NANFRAC=0.1: NaN-mask the field (NEVER_FILL sentinels, what the
    # reference's pre_processor maps NaN to — integration.rs:343-428) so the
    # merging variant pays the general component-min scan tail instead of
    # the single-component broadcast shortcut.  Real astronomy data is
    # NaN-heavy; this records the rate that workload actually gets
    # (VERDICT r3 #2).  BENCH_NANSHAPE picks the mask morphology:
    # 'dots' (default — salt-and-pepper bad pixels, the ADVERSARIAL case
    # for the scan tail's run lengths) or 'blobs' (a few contiguous
    # elliptical regions — coverage boundaries; runs stay long).
    nanfrac = float(os.environ.get("BENCH_NANFRAC", "0"))
    nanshape = os.environ.get("BENCH_NANSHAPE", "dots")
    if nanfrac > 0 and nanshape == "dots":
        img[rng.random((size, size)) < nanfrac] = 255
    elif nanfrac > 0:
        yy, xx = np.mgrid[0:size, 0:size]
        mask = np.zeros((size, size), dtype=bool)
        # ~8 ellipses sized so the union covers ~nanfrac of the area.
        r_mean = size * np.sqrt(nanfrac / (8 * np.pi))
        for _ in range(8):
            cy, cx = rng.integers(0, size, 2)
            ry, rx = rng.uniform(0.5, 1.5, 2) * r_mean
            mask |= ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 < 1
        img[mask] = 255
    # Stage the input on-device once: the tunnelled host->device link runs at
    # ~50 MB/s and would otherwise dominate the measurement (a 4096^2 u8
    # upload costs ~350 ms vs ~30 ms of on-chip compute).
    img = jax.device_put(jnp.asarray(img))
    jax.block_until_ready(img)

    def checksum(lab):
        # Exact int32 modular hash: plain sum + position-weighted sum
        # (odd multiplier => bijective mixing), immune to the float-mantissa
        # collisions of a f32 sum.
        lab = lab.reshape(-1).astype(jnp.int32)
        pos = jax.lax.iota(jnp.int32, lab.shape[0]) * jnp.int32(-1640531527)
        return jnp.sum(lab) ^ jnp.sum(lab * pos)

    @partial(jax.jit, static_argnames=("n",))
    def run_many(img, n):
        def body(i, carry):
            chk_prev, acc = carry
            # Serial data dependency (always 0 at runtime, unprovable at
            # compile time): forces n genuine back-to-back executions.
            salt = jnp.where(chk_prev == jnp.int32(-123456789), 1, 0).astype(
                jnp.uint8
            )
            out = watershed_e2e_impl(
                img + salt,
                max_water_level=max_lvl,
                merging=merging,
                backend=backend,
                tile=tile,
                steps=steps,
            )
            chk = checksum(out)
            return chk, acc.at[i].set(chk)

        _, acc = jax.lax.fori_loop(
            0, n, body, (jnp.int32(0), jnp.zeros((n,), jnp.int32))
        )
        return acc

    acc = np.asarray(run_many(img, inner))  # compile + warm
    assert np.all(acc == acc[0]), f"nondeterministic result: {acc}"
    chk0 = acc[0]
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        acc = np.asarray(run_many(img, inner))
        times.append(time.perf_counter() - t0)
        assert np.all(acc == chk0), f"nondeterministic result: {acc} vs {chk0}"

    dt = min(times) / inner
    mpix_s = size * size / dt / 1e6
    variant = "merging" if merging else "segmenting"
    if nanfrac > 0:
        variant += f"_nan{round(nanfrac * 100)}"
        if nanshape != "dots":
            variant += f"_{nanshape}"
    print(
        json.dumps(
            {
                "metric": f"{variant}_{size}x{size}_u8_throughput",
                "value": round(mpix_s, 2),
                "unit": "Mpix/s",
                "vs_baseline": round(mpix_s / 500.0, 4),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
