"""Headline benchmark: segmenting watershed throughput on one TPU chip.

BASELINE.md metric: 4096x4096 u8 uniform random field, seeds from
find_local_minima, full 255-level segmenting transform, Mpix/s per chip.
North-star target (the reference publishes no numbers): 500 Mpix/s.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Mpix/s", "vs_baseline": N/500}

Timing note: the result is forced with a dependent on-device scalar reduction
fetched to the host (4 bytes) — on the tunnelled TPU platform
``block_until_ready`` returns before execution completes, and fetching the
full label image would time the tunnel, not the chip.
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

    from rustronomy_watershed_tpu.ops.pipeline import watershed_e2e

    size = int(os.environ.get("BENCH_SIZE", "4096"))
    max_lvl = int(os.environ.get("BENCH_LEVELS", "254"))
    merging = os.environ.get("BENCH_MERGING", "0") == "1"
    backend = os.environ.get(
        "BENCH_BACKEND", "pallas" if merging else "relax_pallas"
    )
    reps = int(os.environ.get("BENCH_REPS", "3"))
    tile = int(os.environ.get("BENCH_TILE", "64" if merging else "256"))
    steps = int(os.environ.get("BENCH_STEPS", "8"))

    rng = np.random.default_rng(0)
    img = rng.integers(0, 254, size=(size, size)).astype(np.uint8)
    # Stage the input on-device once: the tunnelled host->device link runs at
    # ~50 MB/s and would otherwise dominate the measurement (a 4096^2 u8
    # upload costs ~350 ms vs ~30 ms of on-chip compute).
    img = jax.device_put(jnp.asarray(img))
    jax.block_until_ready(img)

    checksum = jax.jit(lambda x: jnp.sum(x.astype(jnp.float64 if False else jnp.float32)))

    def run():
        out = watershed_e2e(
            img, max_water_level=max_lvl, merging=merging, backend=backend,
            tile=tile, steps=steps,
        )
        return float(checksum(out))

    chk = run()  # compile + warm
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        chk2 = run()
        times.append(time.perf_counter() - t0)
        assert chk2 == chk, "nondeterministic result"

    dt = min(times)
    mpix_s = size * size / dt / 1e6
    variant = "merging" if merging else "segmenting"
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
