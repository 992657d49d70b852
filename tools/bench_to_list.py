"""Wall-clock timing of the public merging ``transform_to_list`` (VERDICT #5).

This path is HOST-facing by design (the reference returns a host Vec per
level), so unlike bench.py it times real end-to-end walls — device compute
+ tunnel downloads + the native C++ union/redistribution tail — warm, over
several reps, reporting min/median (the tunnel's download-bandwidth windows
make single reps noisy; BENCHMARKS.md documents the variance).

Run on the TPU:  python tools/bench_to_list.py [size [reps]]
``BENCH_MERGING=0`` benches the SEGMENTING variant (the compact-planes
path added in round 9); default is merging.
``BENCH_OLD_SEG=1`` additionally times the pre-round-9 segmenting path
(the on-device (levels, K+1) table + whole-table download) for reference.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from rustronomy_watershed_tpu.prelude import TransformBuilder

    size = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    merging = os.environ.get("BENCH_MERGING", "1") == "1"
    name = "merging" if merging else "segmenting"
    rng = np.random.default_rng(0)
    img = rng.integers(0, 254, size=(size, size)).astype(np.uint8)

    b = TransformBuilder.default()
    ws = b.build_merging() if merging else b.build_segmenting()
    seeds = ws.find_local_minima(img)
    k = len(seeds)

    rows = ws.transform_to_list(img, seeds, counts_length=k + 1)  # compile+warm
    assert len(rows) == 255 and rows[0][0] == 0

    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        rows = ws.transform_to_list(img, seeds, counts_length=k + 1)
        times.append(time.perf_counter() - t0)
    times.sort()
    med = times[len(times) // 2]
    print(
        f"transform_to_list {name} {size}^2, {k} seeds, compact "
        f"(K+1 counts), warm: min {times[0]:.2f} s, median {med:.2f} s "
        f"over {reps} reps"
    )

    if not merging and os.environ.get("BENCH_OLD_SEG") == "1":
        # Reference timing for the PRE-round-9 segmenting path: per-level
        # device table + whole-table download (the label bucket pads K to
        # the next power of two exactly like the production path did).
        import jax
        from functools import partial

        from rustronomy_watershed_tpu.models.base import _label_bucket
        from rustronomy_watershed_tpu.ops.pipeline import watershed_e2e_impl

        bucket = _label_bucket(k)
        fn = jax.jit(
            partial(
                watershed_e2e_impl,
                max_water_level=254,
                merging=False,
                backend="relax_pallas",
                collect="sizes",
                n_labels=bucket,
            )
        )
        _, sz = fn(img)  # compile+warm
        np.asarray(sz)
        t0 = time.perf_counter()
        _, sz = fn(img)
        sz_np = np.asarray(sz)
        dt = time.perf_counter() - t0
        print(
            f"  old device-table path: {dt:.2f} s warm "
            f"(table {sz_np.nbytes / 1e6:.0f} MB downloaded)"
        )


if __name__ == "__main__":
    main()
