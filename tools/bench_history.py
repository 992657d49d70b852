"""Wall-clock timing of the public ``transform_history`` (round 9).

Host-facing by design (the reference returns one host snapshot per level,
src/lib.rs:1233-1237): real end-to-end walls, warm.  Round 9 replaced the
on-device (levels, H, W) snapshot stack (whose download is levels x the
plane size — ~1 GB at 1024²/255 levels) with the compact-planes host
rebuild (ops.merge_curve.relax_history).

Run on the TPU:  python tools/bench_history.py [size [reps]]
``BENCH_MERGING=0`` benches the segmenting variant (default merging).
``BENCH_OLD=1`` additionally times the pre-round-9 device-stack path.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from rustronomy_watershed_tpu.prelude import TransformBuilder

    size = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    merging = os.environ.get("BENCH_MERGING", "1") == "1"
    name = "merging" if merging else "segmenting"
    rng = np.random.default_rng(0)
    img = rng.integers(0, 254, size=(size, size)).astype(np.uint8)

    b = TransformBuilder.default()
    ws = b.build_merging() if merging else b.build_segmenting()
    seeds = ws.find_local_minima(img)
    k = len(seeds)

    snaps = ws.transform_history(img, seeds)  # compile+warm
    assert len(snaps) == 255 and snaps[0][0] == 0

    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        snaps = ws.transform_history(img, seeds)
        times.append(time.perf_counter() - t0)
    times.sort()
    print(
        f"transform_history {name} {size}^2, {k} seeds, 255 levels, warm: "
        f"min {times[0]:.2f} s, median {times[len(times) // 2]:.2f} s "
        f"over {reps} reps"
    )

    if os.environ.get("BENCH_OLD") == "1":
        # Pre-round-9 path: per-level device snapshot stack + download.
        from rustronomy_watershed_tpu.models.base import _label_bucket
        from rustronomy_watershed_tpu.ops.level_driver import run_levels

        ws2 = (
            TransformBuilder.default().build_merging()
            if merging
            else TransformBuilder.default().build_segmenting()
        )
        img_j, lab0 = ws2._prepare(img, seeds)
        kw = dict(
            n_labels=_label_bucket(k),
            max_water_level=254,
            merging=merging,
            collect="history",
            # What _resolved_backend('history') picked before round 9.
            backend="pallas" if merging else "relax_pallas",
        )
        _, hist = run_levels(img_j, lab0, **kw)  # compile+warm
        np.asarray(hist)
        t0 = time.perf_counter()
        _, hist = run_levels(img_j, lab0, **kw)
        hist_np = np.asarray(hist)
        dt = time.perf_counter() - t0
        print(
            f"  old device-stack path ({kw['backend']}): {dt:.2f} s warm "
            f"(stack {hist_np.nbytes / 1e6:.0f} MB downloaded)"
        )


if __name__ == "__main__":
    main()
