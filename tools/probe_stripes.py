"""On-hardware parity + perf probe for the column-blocked relax kernel.

Usage (on the TPU):
  python tools/probe_stripes.py parity   # striped vs 1-D engine at 2048²
  python tools/probe_stripes.py bench NX CW TILE [SIZE] [MERGING]

The parity mode is the stripe-path instance of the chip-selftest rule
(CLAUDE.md "validate every on-chip numeric path at >= 2048²"): CPU CI
provably cannot catch TPU-only miscompiles (the bf16 hazard), so the
striped kernel must be compared against the already-certified 1-D engine
ON THE CHIP before any timing run is trusted.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from rustronomy_watershed_tpu.ops.pallas_relax import relax_packed_planes

    mode = sys.argv[1] if len(sys.argv) > 1 else "parity"
    rng = np.random.default_rng(7)

    if mode == "parity":
        h = w = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
        img = rng.integers(0, 254, (h, w)).astype(np.uint8)
        img_d = jax.device_put(jnp.asarray(img))

        t0 = time.perf_counter()
        k1, l1, p1, c1, _, s1 = relax_packed_planes(img_d, None)
        a_key = np.asarray(k1[p1 : p1 + h, c1 : c1 + w])
        a_lab = np.asarray(l1[p1 : p1 + h, c1 : c1 + w])
        print(f"1-D engine done in {time.perf_counter()-t0:.1f}s", flush=True)

        nx, cw = (2, (w // 2 + 127) // 128 * 128)
        t0 = time.perf_counter()
        k2, l2, p2, c2, _, s2 = relax_packed_planes(
            img_d, None, stripes=(nx, cw)
        )
        b_key = np.asarray(k2[p2 : p2 + h, c2 : c2 + w])
        b_lab = np.asarray(l2[p2 : p2 + h, c2 : c2 + w])
        print(f"striped engine done in {time.perf_counter()-t0:.1f}s", flush=True)

        ok = np.array_equal(a_key, b_key) and np.array_equal(a_lab, b_lab)
        if not ok:
            bad = np.argwhere(a_lab != b_lab)
            print(f"MISMATCH: {len(bad)} label cells, first {bad[:5]}")
            bad = np.argwhere(a_key != b_key)
            print(f"MISMATCH: {len(bad)} key cells, first {bad[:5]}")
            return 1
        print(f"PARITY OK at {h}x{w} (starved={bool(s1)}/{bool(s2)})")
        return 0

    if mode == "bench":
        nx, cw, tile = int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4])
        size = int(sys.argv[5]) if len(sys.argv) > 5 else 8192
        merging = len(sys.argv) > 6 and sys.argv[6] == "1"
        os.environ["RWT_RELAX_STRIPES"] = f"{nx},{cw}"
        os.environ["BENCH_SIZE"] = str(size)
        os.environ["BENCH_TILE"] = str(tile)
        if merging:
            os.environ["BENCH_MERGING"] = "1"
        import bench

        return bench.main()

    print(f"unknown mode {mode}")
    return 2


if __name__ == "__main__":
    sys.exit(main())
