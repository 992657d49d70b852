"""Measure the fast-path checkpoint loop's overhead (VERDICT r4 #3 'done').

Compares wall time of the public transform at 4096² (10% NEVER_FILL
merging — a checkpoint-worthy workload) across:
  (a) the plain fast path (run_levels single-jit),
  (b) the checkpointed host loop with NO snapshot (every=huge) — pure
      loop/speculation overhead,
  (c) with ONE async plane snapshot (every=1) — the downlink cost, which
      on this tunnelled platform is bandwidth-bound (~12-46 MB/s) and
      overlaps compute only partially.

Wall times are SINGLE-CALL (not inner-amortised): checkpointing is about
one long transform, and the ~26 ms tunnel RTT that every public call pays
is part of the story.  Run: python tools/probe_ckpt_overhead.py [size]
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from rustronomy_watershed_tpu.models.base import _label_bucket
    from rustronomy_watershed_tpu.ops import paint_seeds, run_levels
    from rustronomy_watershed_tpu.ops.ckpt_relax import ckpt_transform
    from rustronomy_watershed_tpu.ops.seeds import (
        local_extrema_mask,
        seed_labels_from_mask,
    )
    from rustronomy_watershed_tpu.utils.checkpoint import TransformCheckpointer

    size = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    rng = np.random.default_rng(0)
    img = rng.integers(0, 254, size=(size, size)).astype(np.uint8)
    img[rng.random((size, size)) < 0.1] = 255
    img_d = jax.device_put(jnp.asarray(img))
    lab0 = seed_labels_from_mask(local_extrema_mask(img_d))
    k = _label_bucket(int(jax.device_get(jnp.max(lab0))))
    lab0_p = paint_seeds  # noqa: F841 (import kept for parity with models)

    def wall(fn, reps=5):
        fn()  # compile + warm
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn()
            np.asarray(out[0] if isinstance(out, tuple) else out)
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    base = wall(
        lambda: run_levels(
            img_d, lab0, n_labels=k, max_water_level=254, merging=True,
            backend="relax_pallas",
        )
    )
    print(f"(a) plain fast path          : {base * 1e3:8.1f} ms")

    t_loop = wall(
        lambda: ckpt_transform(
            img_d, lab0, merging=True, n_labels=k,
            checkpointer=None,
        )[0]
    )
    print(
        f"(b) ckpt loop, no snapshot   : {t_loop * 1e3:8.1f} ms "
        f"(+{100 * (t_loop - base) / base:.1f}%)"
    )

    with tempfile.TemporaryDirectory() as d:

        def with_snap():
            ck = TransformCheckpointer(os.path.join(d, str(time.time_ns())), every=1)
            return ckpt_transform(
                img_d, lab0, merging=True, n_labels=k, checkpointer=ck,
            )[0]

        t_snap = wall(with_snap, reps=3)
    print(
        f"(c) + one plane snapshot     : {t_snap * 1e3:8.1f} ms "
        f"(+{100 * (t_snap - base) / base:.1f}% — downlink-bound on the "
        "tunnel; see BENCHMARKS)"
    )


if __name__ == "__main__":
    main()
