"""Wall-clock timing of the public merging ``transform_to_list`` (VERDICT #5).

This path is HOST-facing by design (the reference returns a host Vec per
level), so unlike bench.py it times real end-to-end walls — device compute
+ tunnel downloads + the native C++ union/redistribution tail — warm, over
several reps, reporting min/median (the tunnel's download-bandwidth windows
make single reps noisy; BENCHMARKS.md documents the variance).

Run on the TPU:  python tools/bench_to_list.py [size [reps]]
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
    rng = np.random.default_rng(0)
    img = rng.integers(0, 254, size=(size, size)).astype(np.uint8)

    ws = TransformBuilder.default().build_merging()
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
        f"transform_to_list merging {size}^2, {k} seeds, compact "
        f"(K+1 counts), warm: min {times[0]:.2f} s, median {med:.2f} s "
        f"over {reps} reps"
    )


if __name__ == "__main__":
    main()
